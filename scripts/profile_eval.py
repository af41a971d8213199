"""Eval tile anatomy: where the ~5-6 ms/tile exact top-k goes.

The tiled evaluator costs ~0.28-0.32 s for 52k users x 91.6k items
(DESIGN.md section 6) — ~5-6 ms per 1024-user tile against a ~1.4 ms
3-pass streaming floor (GEMM write + window-max read + extraction read
of the 375 MB f32 score tile at 819 GB/s). This measures the cumulative
pipeline so stage diffs attribute the gap:

  a) GEMM + row-sum            (the score stream itself)
  b) + packed-mask select      (the unpack+select pass)
  c) + 128-window max          (phase-1 reduction)
  d) + top-k over window maxes (narrow sort, nw=716)
  e) full exact_topk_2phase    (adds one-hot einsum + final k*128 top-k)
  f) fused-mask variant: window-max reads RAW sim with the mask select
     fused (no masked-sim materialization); candidates extracted from
     RAW sim; candidate masks recovered EXACTLY by pushing the packed
     u32 words through the same one-hot einsum as two 16-bit f32 planes
     (f32 holds 16-bit integers exactly; nw-wide — tiny next to the
     (B, nw, w) extraction) and unpacking per candidate window.

Per-iter tiles and a 16-slab of rotating bit masks keep XLA from
hoisting any loop-invariant unpack out of the scan (the lesson from the
scatter profiles: hoisted work times as free).

Run: python scripts/profile_eval.py  (real TPU, ~4 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from heat_tpu.evaluation.evaluator import (
    NEG_INF,
    _TOPK_WINDOW,
    exact_topk_2phase,
)

T, D, K = 1024, 64, 50
I_PAD = 91_648  # AmazonBooks 91_599 padded to the 128-lane multiple
W = I_PAD // 32
ITERS = 100
N_SLABS = 16


def scan_time(name, body, xs, iters=ITERS):
    fn = jax.jit(lambda xs: jax.lax.scan(body, None, xs)[1])
    out = fn(xs)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    del out
    t0 = time.perf_counter()
    out = fn(xs)
    _ = float(jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.3f} ms/tile")
    del out
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    items = jnp.asarray(rng.standard_normal((I_PAD, D)), jnp.float32)
    item_t = items.T
    u_all = jnp.asarray(
        rng.standard_normal((ITERS, T, D)), jnp.float32
    )
    # ~45 set bits per row (the AmazonBooks train-pair density).
    bits_np = np.zeros((N_SLABS, T, W), np.uint32)
    for s in range(N_SLABS):
        ids = rng.integers(0, I_PAD, (T, 45))
        rows = np.repeat(np.arange(T), 45)
        bits_np[s, rows, ids.ravel() // 32] |= np.uint32(1) << (
            ids.ravel() % 32
        ).astype(np.uint32)
    slab = jnp.asarray(bits_np)
    idxs = jnp.arange(ITERS, dtype=jnp.int32) % N_SLABS
    xs = (u_all, idxs)
    shifts = jnp.arange(32, dtype=jnp.uint32)

    def gemm(u):
        return jnp.dot(
            u, item_t,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def masked(sim, bits):
        simp = sim.reshape(T, W, 32)
        return jnp.where(
            (bits[:, :, None] >> shifts) & 1 == 1, NEG_INF, simp
        ).reshape(T, I_PAD)

    def a_body(_, x):
        u, i = x
        return None, jnp.sum(gemm(u), axis=1)

    def b_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        return None, jnp.sum(masked(gemm(u), bits), axis=1)

    w = _TOPK_WINDOW
    nw = I_PAD // w

    def c_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        wmax = jnp.max(sim.reshape(T, nw, w), axis=2)
        return None, jnp.sum(wmax, axis=1)

    def d_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        wmax = jnp.max(sim.reshape(T, nw, w), axis=2)
        ws, widx = jax.lax.top_k(wmax, K)
        return None, ws + widx.astype(jnp.float32)

    def e_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        s, ids = exact_topk_2phase(sim, K)
        return None, s + ids.astype(jnp.float32)

    def f_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = gemm(u)
        sim3 = sim.reshape(T, nw, w)
        bitsw = bits.reshape(T, nw, w // 32)
        maskb = (bitsw[:, :, :, None] >> shifts) & 1 == 1
        wmax = jnp.max(
            jnp.where(
                maskb.reshape(T, nw, w), NEG_INF, sim3
            ),
            axis=2,
        )
        _, widx = jax.lax.top_k(wmax, K)
        onehot = (
            widx[:, :, None]
            == jnp.arange(nw, dtype=widx.dtype)[None, None, :]
        ).astype(jnp.float32)
        cand = jnp.einsum(
            "bkn,bnw->bkw", onehot, sim3,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # EXACT candidate masks: u32 words as two 16-bit f32 planes
        # through the same one-hot (f32 is exact to 2^24).
        hi = (bitsw >> 16).astype(jnp.float32)
        lo = (bitsw & jnp.uint32(0xFFFF)).astype(jnp.float32)
        chi = jnp.einsum(
            "bkn,bnc->bkc", onehot, hi,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        clo = jnp.einsum(
            "bkn,bnc->bkc", onehot, lo,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cw = (
            chi.astype(jnp.uint32) << 16
        ) | clo.astype(jnp.uint32)  # (T, K, w//32)
        cmask = (
            (cw[:, :, :, None] >> shifts) & 1 == 1
        ).reshape(T, K, w)
        cand = jnp.where(cmask, NEG_INF, cand)
        scores, local = jax.lax.top_k(cand.reshape(T, K * w), K)
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    def _phase1(u, i):
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        sim3 = sim.reshape(T, nw, w)
        wmax = jnp.max(sim3, axis=2)
        _, widx = jax.lax.top_k(wmax, K)
        onehot = (
            widx[:, :, None]
            == jnp.arange(nw, dtype=widx.dtype)[None, None, :]
        ).astype(jnp.float32)
        return sim3, widx, onehot

    def g_body(_, x):
        # phase 1 + the HIGHEST one-hot einsum, NO final top-k:
        # attributes the einsum vs the k*w sort.
        u, i = x
        sim3, widx, onehot = _phase1(u, i)
        cand = jnp.einsum(
            "bkn,bnw->bkw", onehot, sim3,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return None, jnp.sum(cand, axis=(1, 2))

    def _hilo_cand(onehot, sim3):
        # EXACT f32 extraction in two DEFAULT-precision passes: each
        # product term is onehot(0/1) * part, each part a bf16 value
        # promoted exactly; hi + lo reassembles the f32 score exactly.
        hi = sim3.astype(jnp.bfloat16)
        lo = (sim3 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        chi = jnp.einsum(
            "bkn,bnw->bkw", onehot.astype(jnp.bfloat16), hi,
            preferred_element_type=jnp.float32,
        )
        clo = jnp.einsum(
            "bkn,bnw->bkw", onehot.astype(jnp.bfloat16), lo,
            preferred_element_type=jnp.float32,
        )
        return chi + clo

    def h_body(_, x):
        u, i = x
        sim3, widx, onehot = _phase1(u, i)
        cand = _hilo_cand(onehot, sim3)
        return None, jnp.sum(cand, axis=(1, 2))

    def i_body(_, x):
        # full pipeline with the hi/lo einsum.
        u, i = x
        sim3, widx, onehot = _phase1(u, i)
        cand = _hilo_cand(onehot, sim3)
        scores, local = jax.lax.top_k(cand.reshape(T, K * w), K)
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    # --- Pallas extraction: stream each 8-row block of the (T, I) score
    # matrix through VMEM ONCE and run the one-hot selection matmul
    # in-VMEM (tiny MXU work, no HBM re-read of padded operands, no
    # separate 6-pass HIGHEST stream over HBM).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BR = 8
    KP = 64  # K padded to a sublane multiple; pad rows select nothing

    def _extract_kernel(widx_ref, sim_ref, out_ref):
        sim3 = sim_ref[...].reshape(BR, nw, w)
        wr = widx_ref[...]
        iota = jax.lax.broadcasted_iota(jnp.int32, (KP, nw), 1)
        for r in range(BR):
            oh = (wr[r][:, None] == iota).astype(jnp.float32)
            out_ref[r] = jnp.dot(
                oh, sim3[r],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    def pallas_extract(sim, widx):
        widx_p = jnp.concatenate(
            [
                widx,
                jnp.full((T, KP - K), nw, widx.dtype),
            ],
            axis=1,
        )
        out = pl.pallas_call(
            _extract_kernel,
            grid=(T // BR,),
            in_specs=[
                pl.BlockSpec((BR, KP), lambda i: (i, 0)),
                pl.BlockSpec((BR, I_PAD), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((BR, KP, w), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, KP, w), jnp.float32),
        )(widx_p, sim)
        return out[:, :K]

    def topk2level(cand2, w2=32):
        # Second-level window selection over the (T, K*w) candidates:
        # shrinks the final sort 4x (6400 -> 1600).
        b, n = cand2.shape
        nw2 = n // w2
        c3 = cand2.reshape(b, nw2, w2)
        wmax2 = jnp.max(c3, axis=2)
        _, widx2 = jax.lax.top_k(wmax2, K)
        oh2 = (
            widx2[:, :, None]
            == jnp.arange(nw2, dtype=widx2.dtype)[None, None, :]
        ).astype(jnp.float32)
        c2 = jnp.einsum(
            "bkn,bnw->bkw", oh2, c3,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores, local = jax.lax.top_k(c2.reshape(b, K * w2), K)
        ids = (
            jnp.take_along_axis(widx2, local // w2, axis=1) * w2
            + local % w2
        )
        return scores, ids

    def j_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        wmax = jnp.max(sim.reshape(T, nw, w), axis=2)
        _, widx = jax.lax.top_k(wmax, K)
        cand = pallas_extract(sim, widx)
        scores, local = jax.lax.top_k(cand.reshape(T, K * w), K)
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    def k_body(_, x):
        u, i = x
        sim3, widx, onehot = _phase1(u, i)
        cand = jnp.einsum(
            "bkn,bnw->bkw", onehot, sim3,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores, local = topk2level(cand.reshape(T, K * w))
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    def l_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        wmax = jnp.max(sim.reshape(T, nw, w), axis=2)
        _, widx = jax.lax.top_k(wmax, K)
        cand = pallas_extract(sim, widx)
        scores, local = topk2level(cand.reshape(T, K * w))
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    def _extract_kernel_slices(widx_ref, sim_ref, out_ref):
        # Extraction via in-VMEM dynamic slices (one (1, w) vector load
        # per candidate window) instead of per-row HIGHEST dots — probes
        # whether the batched-small-matmul overhead is the einsum's cost.
        sim3 = sim_ref[...].reshape(BR, nw, w)
        wr = widx_ref[...]
        for r in range(BR):
            row = sim3[r]
            for j in range(K):
                out_ref[r, j] = jax.lax.dynamic_slice(
                    row, (wr[r, j], 0), (1, w)
                )[0]

    def pallas_extract_slices(sim, widx):
        return pl.pallas_call(
            _extract_kernel_slices,
            grid=(T // BR,),
            in_specs=[
                pl.BlockSpec((BR, K), lambda i: (i, 0)),
                pl.BlockSpec((BR, I_PAD), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((BR, K, w), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, K, w), jnp.float32),
        )(widx, sim)

    def o_body(_, x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        sim = masked(gemm(u), bits)
        wmax = jnp.max(sim.reshape(T, nw, w), axis=2)
        _, widx = jax.lax.top_k(wmax, K)
        cand = pallas_extract_slices(sim, widx)
        scores, local = jax.lax.top_k(cand.reshape(T, K * w), K)
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    def m_body(_, x):
        # DEFAULT-precision einsum (INEXACT — timing only): splits the
        # einsum's cost into bf16-pass count vs batched-small-matmul
        # overhead. If this is ~as slow as HIGHEST, the shape is the
        # problem, not the passes.
        u, i = x
        sim3, widx, onehot = _phase1(u, i)
        cand = jnp.einsum(
            "bkn,bnw->bkw", onehot, sim3,
            preferred_element_type=jnp.float32,
        )
        scores, local = jax.lax.top_k(cand.reshape(T, K * w), K)
        ids = (
            jnp.take_along_axis(widx, local // w, axis=1) * w + local % w
        )
        return None, scores + ids.astype(jnp.float32)

    cand_slab = jnp.asarray(
        rng.standard_normal((N_SLABS, T, K * w)), jnp.float32
    )

    def n_time():
        # Isolated final top-k over rotating (T, K*w) slabs: its true
        # cost with no upstream producer in the fusion. The slab rides
        # as an ARGUMENT — a 419 MB closure constant exceeds the remote
        # compiler's upload limit (HTTP 413).
        def body(_, i, cs):
            cand = jax.lax.dynamic_index_in_dim(cs, i, keepdims=False)
            s, ids = jax.lax.top_k(cand, K)
            return None, s + ids.astype(jnp.float32)

        fn = jax.jit(
            lambda cs, ii: jax.lax.scan(
                lambda c, i: body(c, i, cs), None, ii
            )[1]
        )
        out = fn(cand_slab, idxs)
        _ = float(out.ravel()[0])
        del out
        t0 = time.perf_counter()
        out = fn(cand_slab, idxs)
        _ = float(out.ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{'n) isolated top_k(K*w)':44s} {dt * 1e3:8.3f} ms/tile")
        del out
        return dt

    # Stage diffs a-d and variants f/h/i were measured 2026-08-21
    # (see DESIGN.md): a 1.07, b 1.19, c 1.32, d 1.52, e 5.93, f 5.80
    # (no win — XLA still materializes the masked operand), h/i hi/lo
    # einsum slower AND NaN-broken on NEG_INF. Timed set now: the
    # baselines + the two real levers.
    # Measured 2026-08-21 (this box): d 1.51-1.58, e 5.90-5.95,
    # g 4.31 (einsum HIGHEST 2.74, final top-k 1.59), j 6.00 (pallas
    # MXU extract — batched-small-dot bound, no win), k 5.95 (2-level
    # final top-k — no win), l 5.98, m 4.60 (DEFAULT einsum 1.45 ms:
    # half the einsum is bf16 passes, half overhead). Timed set now:
    # the two open probes.
    te = 5.948e-3
    tn = n_time()
    to = scan_time("o) pallas slice-extract + full topk", o_body, xs)
    print()
    print(f"isolated topk:    {tn * 1e3:7.3f} ms")
    print(f"o vs e saved:     {(te - to) * 1e3:7.3f} ms (vs recorded e)")
    # Correctness: f must return the same top-k SCORES as e on every
    # tile (ids may resolve tau-ties differently; scores cannot).
    def e_scores(x):
        u, i = x
        bits = jax.lax.dynamic_index_in_dim(slab, i, keepdims=False)
        s, _ = exact_topk_2phase(masked(gemm(u), bits), K)
        return s

    def f_scores(x):
        _, out = f_body(None, x)
        return out

    se = jax.jit(e_scores)((u_all[0], idxs[0]))
    # f_body returns scores + ids; recompute scores-only via its pieces
    # is overkill — compare against e by re-running f with ids stripped:
    sf_plus = jax.jit(f_scores)((u_all[0], idxs[0]))
    # strip the ids term by recomputing e's ids contribution is not
    # possible; instead assert score-sets via sorted diffs of the score
    # part obtained from a second e run with ids added the same way:
    se_plus = se + jax.jit(
        lambda x: exact_topk_2phase(
            masked(
                gemm(x[0]),
                jax.lax.dynamic_index_in_dim(slab, x[1], keepdims=False),
            ),
            K,
        )[1].astype(jnp.float32)
    )((u_all[0], idxs[0]))
    d_sets = float(
        jnp.max(
            jnp.abs(jnp.sort(se_plus, axis=1) - jnp.sort(sf_plus, axis=1))
        )
    )
    print(f"e-vs-f sorted (score+id) max|diff|: {d_sets:.3e} "
          "(0 unless tau-ties resolve differently)")
    for nm, body in (("j", j_body), ("k", k_body), ("l", l_body)):
        sv = jax.jit(lambda x, b=body: b(None, x)[1])((u_all[0], idxs[0]))
        dv = float(
            jnp.max(
                jnp.abs(jnp.sort(se_plus, axis=1) - jnp.sort(sv, axis=1))
            )
        )
        print(f"e-vs-{nm} sorted (score+id) max|diff|: {dv:.3e}")


if __name__ == "__main__":
    main()
