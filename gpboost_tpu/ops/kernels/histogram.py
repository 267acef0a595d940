"""Pallas TPU histogram kernel for gradient-boosting.

The reference offloads histogram construction to OpenCL/CUDA kernels
(``treelearner/ocl/histogram{16,64,256}.cl``, ``cuda_kernel_launcher.cu``);
the TPU equivalent maps the scatter-add onto the MXU: for each feature, the
row-chunk one-hot matrix ``onehot[c, b] = (bins[c] == b)`` is contracted with
the (grad, hess, count) panel — ``hist[f] += vals @ onehot`` — so the whole
histogram build becomes dense matmuls with no scatters at all.

Layout: features-major ([F_tile, n] blocks — lanes along rows, which also
satisfies the (8, 128) VMEM tiling rules). Grid: (feature_tiles,); each
program streams its features' row chunks, accumulating [F_tile, B, 3]
histograms in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(bins_ref, vals_ref, out_ref, *, chunk, num_chunks,
                 f_tile, num_bins):
    """bins_ref [f_tile, n_pad] int32; vals_ref [3, n_pad] f32 (already
    masked and zero-padded); out_ref [f_tile, num_bins, 3] f32."""
    out_ref[...] = jnp.zeros_like(out_ref)

    def chunk_body(c, _):
        # keep index math in i32: x64 mode promotes Python ints to i64, which
        # Mosaic refuses to mix with the i32 loop counter
        start = c * np.int32(chunk)
        bins = bins_ref[:, pl.ds(start, chunk)]        # [f_tile, chunk]
        vals = vals_ref[:, pl.ds(start, chunk)]        # [3, chunk]

        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, num_bins), 1)
        for f in range(f_tile):  # static unroll: traced row indexing of a
            # loaded tile trips a Mosaic lowering recursion
            b = bins[f, :][:, None]                     # [chunk, 1]
            # bool -> i32 -> f32 (direct bool->f32 recurses in Mosaic 0.9)
            onehot = (cols == b).astype(jnp.int32).astype(jnp.float32)
            acc = jax.lax.dot_general(
                vals, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [3, B]
            out_ref[f, :, :] = out_ref[f, :, :] + acc.T
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(jax.jit, static_argnums=(4,))
def histogram_pallas(binned, grad, hess, row_mask, num_bins: int):
    """Drop-in replacement for ``tree.build_histogram`` on TPU.

    Returns (hist_g, hist_h, hist_c) each [F, num_bins] float32. Rows beyond
    n are padded with bin 0 and zero values, so they contribute nothing.
    """
    n, F = binned.shape
    chunk = 512
    f_tile = min(F, 8)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    F_pad = ((F + f_tile - 1) // f_tile) * f_tile
    bins_t = jnp.pad(binned.astype(jnp.int32).T,
                     ((0, F_pad - F), (0, n_pad - n)))
    vals = jnp.stack([
        jnp.where(row_mask, grad, 0.0),
        jnp.where(row_mask, hess, 0.0),
        row_mask.astype(grad.dtype)], axis=0).astype(jnp.float32)
    vals_t = jnp.pad(vals, ((0, 0), (0, n_pad - n)))

    kernel = functools.partial(
        _hist_kernel, chunk=chunk, num_chunks=n_pad // chunk,
        f_tile=f_tile, num_bins=num_bins)
    interpret = jax.default_backend() != "tpu"
    # trace the kernel with x64 disabled: the package enables global x64 for
    # f64 numerics, but 64-bit index types are unsupported by Mosaic
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(F_pad // f_tile,),
            in_specs=[
                pl.BlockSpec((f_tile, n_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((f_tile, num_bins, 3),
                                   lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((F_pad, num_bins, 3), jnp.float32),
        )(bins_t, vals_t)
    out = out[:F]
    return out[..., 0], out[..., 1], out[..., 2]
