

def get_nested_categories(outer_var, inner_var):
    """Categorical variable for NESTED grouped random effects: a distinct
    level for every (outer, inner) combination (reference
    ``get_nested_categories``, ``basic.py:53``)."""
    import numpy as np
    outer = np.asarray(outer_var)
    inner = np.asarray(inner_var)
    if outer.shape[0] != inner.shape[0]:
        raise ValueError("outer_var and inner_var must have equal length")
    pairs = np.char.add(np.char.add(outer.astype(str), "||"),
                        inner.astype(str))
    _, nested = np.unique(pairs, return_inverse=True)
    return nested.astype(np.int64)
