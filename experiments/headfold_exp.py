"""Head-folded attention: pack F heads per MXU pass via sublane concat.

The shipped fused kernel loops heads and issues per-head matmuls of
(Sq, D=64) @ (D, Skv) — at RGQA shapes (Sq/Skv = 20/36/56) both the M
and N dims underfill the MXU's 128-lane tiles (a 56-col scores matrix
occupies a 128-lane tile half-empty), which is why a 56x56 op measures
~880 us at B=384 (~4 TFLOP/s effective, experiments/uniter_gap_exp.py).

The fold: build (bt, F*Sq, D) / (bt, F*Skv, D) operands holding F
heads stacked along the SUBLANE (seq) axis and compute one
(F*Sq, D) @ (D, F*Skv) matmul per group.  The cross-head quadrants are
masked to -1e9 before softmax (exact 0 after exp-underflow), each row's
softmax spans only its own head's Skv block, and the PV matmul
(F*Sq, F*Skv) @ (F*Skv, D) returns every head's context in one pass.
Per-tile VPU cost is UNCHANGED at F=2 (one (112,112) f32 score array
tiles exactly like two (56,56) ones); the MXU sees M/N up to F*S —
e.g. 112/112 instead of 56/56 in the same 128-lane tile.  Distinct from
the two refuted folds: cross-sample folding multiplied REAL flops by
the batch block, and the round-1 ``pallas_big`` cross-head trick folded
along the LANE dim (H*D), which Mosaic cannot reshape.

Lowering constraints found on the way (v5e, 2026-08-19):
- ``jnp.concatenate`` of per-head LANE slices along the sublane axis
  fails to lower ("result/input offset mismatch on non-concat
  dimension"): odd heads' slices carry lane offset 64 inside the
  128-lane tile.  Variant A concats only same-offset head groups
  (evens together, odds together); variant B stages the fold through
  VMEM scratch stores (stores go through Mosaic's relayout path).
- Sublane strides must be 8-aligned: the wrapper pads Sq/Skv up to
  multiples of 8 (bias pad = -1e9, output sliced back).

RESULT (v5e over the axon tunnel, 2026-08-19): see printed table;
recorded in docs/kernels.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, E = 12, 768
D = E // H
B = 384
ITERS = 50


def _struct_mask(fold, sq, skv):
    rowg = jax.lax.broadcasted_iota(jnp.int32, (fold * sq, fold * skv), 0) // sq
    colg = jax.lax.broadcasted_iota(jnp.int32, (fold * sq, fold * skv), 1) // skv
    return jnp.where(rowg == colg, 0.0, -1e9).astype(jnp.float32)[None]


def _concat_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, groups, sq, skv):
    """Variant A: sublane concat of same-lane-offset head slices."""
    scale = 1.0 / (D ** 0.5)
    in_dtype = q_ref.dtype
    fold = len(groups[0])
    bias = m_ref[:]  # (bt, skv)
    bias_f = jnp.concatenate([bias] * fold, axis=1)[:, None, :]
    struct = _struct_mask(fold, sq, skv)
    for hs in groups:
        qc = jnp.concatenate(
            [q_ref[:, :, h * D:(h + 1) * D] for h in hs], axis=1
        )
        kc = jnp.concatenate(
            [k_ref[:, :, h * D:(h + 1) * D] for h in hs], axis=1
        )
        vc = jnp.concatenate(
            [v_ref[:, :, h * D:(h + 1) * D] for h in hs], axis=1
        )
        s = jax.lax.dot_general(
            qc, kc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias_f + struct
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(in_dtype)
        o = jax.lax.dot_general(
            p, vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for j, h in enumerate(hs):
            o_ref[:, :, h * D:(h + 1) * D] = o[
                :, j * sq:(j + 1) * sq
            ].astype(o_ref.dtype)


def _scratch_kernel(
    q_ref, k_ref, v_ref, m_ref, o_ref, qs, ks, vs, *, fold, sq, skv
):
    """Variant B: fold staged through VMEM scratch stores (relayout)."""
    scale = 1.0 / (D ** 0.5)
    in_dtype = q_ref.dtype
    bias = m_ref[:]  # (bt, skv)
    bias_f = jnp.concatenate([bias] * fold, axis=1)[:, None, :]
    struct = _struct_mask(fold, sq, skv)
    for g in range(H // fold):
        hs = [g * fold + j for j in range(fold)]
        for j, h in enumerate(hs):
            qs[:, j * sq:(j + 1) * sq, :] = q_ref[:, :, h * D:(h + 1) * D]
            ks[:, j * skv:(j + 1) * skv, :] = k_ref[:, :, h * D:(h + 1) * D]
            vs[:, j * skv:(j + 1) * skv, :] = v_ref[:, :, h * D:(h + 1) * D]
        s = jax.lax.dot_general(
            qs[:], ks[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias_f + struct
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(in_dtype)
        o = jax.lax.dot_general(
            p, vs[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for j, h in enumerate(hs):
            o_ref[:, :, h * D:(h + 1) * D] = o[
                :, j * sq:(j + 1) * sq
            ].astype(o_ref.dtype)


def headfold(q, k, v, bias, bt, fold, vmem_mb=None, variant="scratch"):
    b, sq0, e = q.shape
    skv0 = k.shape[1]
    # Sublane strides must be 8-aligned: pad seq dims, -1e9 bias pad.
    sq = -(-sq0 // 8) * 8
    skv = -(-skv0 // 8) * 8
    if sq != sq0:
        q = jnp.pad(q, ((0, 0), (0, sq - sq0), (0, 0)))
    if skv != skv0:
        k = jnp.pad(k, ((0, 0), (0, skv - skv0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv - skv0), (0, 0)))
        bias = jnp.pad(
            bias, ((0, 0), (0, skv - skv0)), constant_values=-1e9
        )
    params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
        if vmem_mb
        else None
    )
    if variant == "concat":
        # Same-lane-offset groups only (F=2): evens with evens, odds
        # with odds — both concat inputs share their lane offset.
        assert fold == 2
        groups = [(0, 2), (4, 6), (8, 10), (1, 3), (5, 7), (9, 11)]
        kernel = functools.partial(
            _concat_kernel, groups=groups, sq=sq, skv=skv
        )
        scratch = []
    else:
        kernel = functools.partial(
            _scratch_kernel, fold=fold, sq=sq, skv=skv
        )
        scratch = [
            pltpu.VMEM((bt, fold * sq, D), q.dtype),
            pltpu.VMEM((bt, fold * skv, D), q.dtype),
            pltpu.VMEM((bt, fold * skv, D), q.dtype),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, skv, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, skv), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, sq, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, e), q.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * H * fold * sq * skv * D * 2,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * H * fold * sq * skv,
        ),
    )(q, k, v, bias)
    return out[:, :sq0] if sq != sq0 else out


def xla_ref(q, k, v, bias):
    """Per-head f32 attention on the XLA path (reference numerics).

    A second standalone `_fused_pallas_raw` call was the previous ref and
    OOMed the 16 MiB scoped-vmem limit when compiled outside the timing
    scan (same 21.0 MiB artifact as the xfuse cat kernel) — an XLA ref
    avoids that and is an independent numerics check anyway.
    """
    b, sq, e = q.shape
    skv = k.shape[1]
    qh = q.astype(jnp.float32).reshape(b, sq, H, D).transpose(0, 2, 1, 3)
    kh = k.astype(jnp.float32).reshape(b, skv, H, D).transpose(0, 2, 1, 3)
    vh = v.astype(jnp.float32).reshape(b, skv, H, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (D ** 0.5)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, e)


def timed(fn, args, iters=ITERS):
    @jax.jit
    def loop(*args):
        def body(c, _):
            a = list(args)
            a[0] = a[0] + c.astype(a[0].dtype)
            out = fn(*a)
            return jnp.mean(out.astype(jnp.float32)) * 1e-9, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e6


def main():
    from rgqa_tpu.ops.attention import _fused_pallas_raw

    print(f"devices: {jax.devices()}")
    shapes = [(56, 56), (36, 36), (20, 36), (36, 20), (20, 20)]
    for sq, skv in shapes:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, sq, E), jnp.bfloat16)
        k = jax.random.normal(kk, (B, skv, E), jnp.bfloat16)
        v = jax.random.normal(kv, (B, skv, E), jnp.bfloat16)
        m = jnp.zeros((B, skv), jnp.float32)
        base = timed(lambda q, k, v, m: _fused_pallas_raw(q, k, v, m, H),
                     (q, k, v, m))
        print(f"{sq}x{skv}: shipped {base:7.1f} us", flush=True)
        ref = np.asarray(jax.jit(xla_ref)(q, k, v, m), dtype=np.float32)
        cands = [
            ("concat", 2, 16, None), ("concat", 2, 32, 24),
            ("scratch", 2, 16, None), ("scratch", 2, 32, 24),
            ("scratch", 3, 32, 24), ("scratch", 4, 16, 24),
            ("scratch", 4, 32, 32), ("scratch", 6, 16, 32),
        ]
        for variant, fold, bt, mb in cands:
            if H % fold:
                continue
            try:
                us = timed(
                    lambda q, k, v, m, bt=bt, fold=fold, mb=mb, vr=variant:
                        headfold(q, k, v, m, bt, fold, mb, vr),
                    (q, k, v, m),
                )
                got = np.asarray(
                    headfold(q, k, v, m, bt, fold, mb, variant),
                    dtype=np.float32,
                )
                err = float(np.max(np.abs(got - ref)))
                print(
                    f"{sq}x{skv}: {variant:7s} fold {fold:2d} bt {bt:2d} "
                    f"vmem {mb or 16:3}M {us:7.1f} us "
                    f"({base / us:4.2f}x) max|d|={err:.1e}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()
                detail = next(
                    (l for l in msg if "Not implemented" in l or "RESOURCE" in l
                     or "Ran out" in l or "exceeded" in l),
                    msg[0] if msg else "",
                )
                print(
                    f"{sq}x{skv}: {variant:7s} fold {fold:2d} bt {bt:2d} "
                    f"vmem {mb or 16:3}M FAIL {detail[:100]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
