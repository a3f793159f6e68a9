"""Sharded, prefetching batch iterators.

Replaces torch ``DataLoader`` worker processes with a simple
double-buffered pipeline: host batch build (numpy gather from memory-maps)
overlaps device execution because ``jax`` dispatch is async — the next
batch is device_put while the current step runs.  Shapes are static
(fixed text length, 36 RoIs, padded final batch), so nothing recompiles.
"""

from __future__ import annotations

import collections
import threading
import queue as _queue
import weakref
from typing import Any, Callable, Iterator, Optional

import numpy as np

from rgqa_tpu.parallel import pad_batch_to, shard_batch

__all__ = [
    "batch_indices",
    "batch_iterator",
    "chunked_map",
    "dequantize_feats",
    "device_prefetch",
    "pipelined_map",
    "quantize_feats",
    "wrap_dequant",
]


def batch_indices(
    n: int,
    batch_size: int,
    *,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = False,
) -> Iterator[np.ndarray]:
    """Yield index arrays of (at most) ``batch_size``."""
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    for start in range(0, n, batch_size):
        chunk = order[start : start + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        yield chunk


def batch_iterator(
    encoded,
    batch_size: int,
    *,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = False,
    with_target: bool = True,
    pad_final: bool = True,
) -> Iterator[tuple[list[str], dict, int]]:
    """Yield ``(question_ids, host_batch, real_count)`` triples.

    The final partial batch is padded to ``batch_size`` (repeat-last-row)
    with ``real_count`` marking valid rows, keeping the jitted step's
    shapes static.
    """
    for idx in batch_indices(
        len(encoded), batch_size, shuffle=shuffle, rng=rng, drop_last=drop_last
    ):
        qids = [encoded.question_ids[i] for i in idx]
        batch = encoded.gather_batch(idx, with_target=with_target)
        real = len(idx)
        if pad_final and real < batch_size:
            batch, real = pad_batch_to(batch, batch_size)
        yield qids, batch, real


# Bulk float payloads worth halving on the wire (bf16 models consume them
# as bf16 anyway): RoI features are 295 KB/question f32 — the dominant
# host->device bytes by ~50x (docs/kernels.md, production-loop physics).
_BF16_FEED_KEYS = ("feats", "pixels")


def quantize_feats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-RoI symmetric int8: ``q = round(f / s)``, ``s = maxabs/127``.

    The transport form of the ``feed_int8`` eval feed (docs/kernels.md
    "Feats-wire int8": 1.96-2.02x production q/s on a wire-bound link at
    |dconf| <= ~2e-3).  Returns ``(q int8 (B, R, D), scale f32 (B, R))``.
    """
    maxabs = np.abs(feats).max(axis=-1, keepdims=True)
    scale = (maxabs / 127.0 + 1e-12).astype(np.float32)
    q = np.clip(np.rint(feats / scale), -127, 127).astype(np.int8)
    return q, scale[..., 0]


def dequantize_feats(batch: dict):
    """In-jit inverse of :func:`quantize_feats`: rebuild ``feats`` from
    ``feats_q``/``feats_scale`` (no-op for unquantized batches).

    Dequantizes to f32 — the int8 x f32 product is exact there, and a
    bf16 model casts on device anyway (XLA fuses the cast into the
    consumer); emitting bf16 here would stack a second rounding on top
    of the quantization for f32 models."""
    if "feats_q" not in batch:
        return batch
    import jax.numpy as jnp

    b = dict(batch)
    q = b.pop("feats_q")
    s = b.pop("feats_scale")
    b["feats"] = q.astype(jnp.float32) * s[..., None]
    return b


_DEQUANT_WRAP_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def wrap_dequant(step_fn):
    """``step_fn(params, batch)`` -> the same over an int8-quantized batch,
    dequantizing INSIDE one jit (eager dequant would add a dispatch per
    batch — the exact overhead the int8 feed exists to remove).

    Cached by ``step_fn`` identity: the wrapper's identity keys
    ``chunked_map``'s compile cache, so a stable step fn keeps compiling
    once per process with the feed on."""
    import jax

    try:
        wrapped = _DEQUANT_WRAP_CACHE.get(step_fn)
    except TypeError:
        wrapped = None
    if wrapped is None:
        # Close over a weakref, not step_fn itself: a value that strongly
        # references its WeakKeyDictionary key would be immortal.
        try:
            fn_ref = weakref.ref(step_fn)
        except TypeError:
            fn_ref = lambda step_fn=step_fn: step_fn  # noqa: E731

        @jax.jit
        def wrapped(params, batch):
            fn = fn_ref()
            assert fn is not None, "step_fn collected while in use"
            return fn(params, dequantize_feats(batch))

        try:
            _DEQUANT_WRAP_CACHE[step_fn] = wrapped
        except TypeError:
            pass
    return wrapped

# Jitted scan wrappers for chunked_map, keyed (weakly) by step_fn and
# then by (select, captures-mode); jax.jit's own executable cache
# handles distinct (chunk, batch) shapes.  The wrapper closes over a
# weakref.ref of its key — NOT the step_fn itself — so entries stay
# collectable (a value that strongly references its WeakKeyDictionary
# key would be immortal).
_CHUNK_RUN_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _chunk_runner(step_fn, select, has_captures):
    import jax
    import jax.numpy as jnp

    try:
        per_fn = _CHUNK_RUN_CACHE.get(step_fn)
        if per_fn is None:
            per_fn = {}
            _CHUNK_RUN_CACHE[step_fn] = per_fn
    except TypeError:  # non-weakref-able step_fn: build uncached
        per_fn = {}
    key = (select, has_captures)
    run = per_fn.get(key)
    if run is None:
        try:
            fn_ref = weakref.ref(step_fn)
        except TypeError:
            fn_ref = lambda step_fn=step_fn: step_fn  # noqa: E731

        def run_impl(captures_, group):
            fn = fn_ref()
            assert fn is not None, "step_fn collected while in use"
            # Stack INSIDE the jit: an eager per-leaf jnp.stack would
            # cost extra synchronous dispatches per group on remote
            # chips — the exact overhead chunking exists to remove.
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *group
            )

            def body(c, b):
                out = fn(captures_, b) if has_captures else fn(b)
                if select is not None:
                    out = {k: out[k] for k in select if k in out}
                return c, out

            return jax.lax.scan(body, None, stacked)[1]

        run = jax.jit(run_impl)
        per_fn[key] = run
    return run


def device_prefetch(
    host_iter: Iterator[tuple[list[str], dict, int]],
    mesh=None,
    *,
    depth: int = 2,
    feed_bf16: bool = False,
    feed_int8: bool = False,
) -> Iterator[tuple[list[str], Any, int]]:
    """Background-thread prefetch + device placement.

    A worker thread builds host batches and device_puts them (sharded over
    the mesh's ``data`` axis when a mesh is given) ``depth`` batches ahead,
    overlapping input feed with device compute.

    ``feed_bf16`` casts the bulk float payloads (``feats``/``pixels``) to
    bfloat16 on host before transfer — numerically identical for a bf16
    model (which casts them on device anyway) at half the interconnect
    bytes.  Leave False for f32 models.

    ``feed_int8`` instead ships RoI features as per-RoI int8 + f32 scales
    (quarter the f32 bytes — for wire-bound links, docs/kernels.md
    "Feats-wire int8"); the consuming step must dequantize in-jit
    (:func:`wrap_dequant`).  Eval-only, opt-in (``--feed_int8``): the
    ~0.4% per-element quantization error is NOT free for confidence
    calibration, and grad-at-eval scorers are exempted by their caller.
    """
    q: _queue.Queue = _queue.Queue(maxsize=depth)
    _END = object()

    def put(batch):
        if feed_int8 and isinstance(
            batch.get("feats"), np.ndarray
        ) and batch["feats"].dtype == np.float32:
            fq, fs = quantize_feats(batch["feats"])
            batch = {k: v for k, v in batch.items() if k != "feats"}
            batch["feats_q"], batch["feats_scale"] = fq, fs
        if feed_bf16:
            import ml_dtypes

            batch = {
                k: (
                    v.astype(ml_dtypes.bfloat16)
                    if k in _BF16_FEED_KEYS
                    and getattr(v, "dtype", None) == np.float32
                    else v
                )
                for k, v in batch.items()
            }
        if mesh is not None:
            return shard_batch(mesh, batch)
        import jax

        return jax.tree_util.tree_map(jax.device_put, batch)

    def worker():
        try:
            for qids, batch, real in host_iter:
                q.put((qids, put(batch), real))
        except BaseException as e:  # surface errors on the consumer side
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def pipelined_map(
    step_fn: Callable[[Any], Any],
    batches: Iterator[tuple[list[str], Any, int]],
    *,
    lag: int = 4,
) -> Iterator[tuple[list[str], Any, int]]:
    """Dispatch ``step_fn`` over batches, fetching outputs ``lag`` behind.

    JAX dispatch is async: ``step_fn(batch)`` returns device buffers
    immediately while the program queues on the device.  Fetching the
    result with ``np.asarray`` right away (as a naive eval loop does)
    serializes dispatch -> device compute -> host transfer per batch —
    on a tunneled TPU that stalls the device for a full RTT every batch.
    Keeping a ``lag``-deep queue of in-flight outputs lets the host
    transfer of batch ``i`` overlap the device compute of batches
    ``i+1 .. i+lag`` (the output analogue of :func:`device_prefetch`;
    replaces the reference's synchronous eval loops,
    ``src/tasks/gqa_conf.py:297-333``).

    Yields ``(question_ids, host_outputs, real_count)`` in input order;
    ``host_outputs`` is ``step_fn``'s pytree with every leaf as numpy.
    """
    import jax

    fetch = lambda out: jax.tree_util.tree_map(np.asarray, out)
    pending: collections.deque = collections.deque()
    for qids, batch, real in batches:
        pending.append((qids, step_fn(batch), real))
        if len(pending) > lag:
            qids0, out0, real0 = pending.popleft()
            yield qids0, fetch(out0), real0
    while pending:
        qids0, out0, real0 = pending.popleft()
        yield qids0, fetch(out0), real0


def chunked_map(
    step_fn: Callable[..., Any],
    batches: Iterator[tuple[list[str], Any, int]],
    *,
    chunk: int = 1,
    lag: int = 1,
    captures: Any = None,
    select: Optional[tuple] = None,
) -> Iterator[tuple[list[str], Any, int]]:
    """:func:`pipelined_map` with ``chunk`` batches per device dispatch.

    Each group of ``chunk`` device batches is stacked on device and run
    through ONE jitted ``lax.scan`` — ``chunk``-fold fewer dispatches.
    This matters where a dispatch costs a synchronous round trip
    (remote/tunneled chips): measured on the tunneled v5e at batch 384,
    the per-batch loop over device-resident inputs runs at ~2.5k q/s at
    ANY output-fetch lag (each ``jit`` call blocks on the wire), while
    chunked dispatch reaches 8.6-8.7k — within ~20% of the chained-scan
    bound (`experiments/dispatch_exp.py`, docs/kernels.md).  On a
    host-attached chip dispatch is a local enqueue and ``chunk=1``
    (plain :func:`pipelined_map`) already overlaps fully.

    ``step_fn`` must be jax-traceable (every eval step here is a jitted
    scorer call).  Large arrays the step needs — model params above all
    — MUST be passed via ``captures`` (the step is then called as
    ``step_fn(captures, batch)``), not closed over: values a jit traces
    over become embedded constants, and a 400 MB param pytree inside
    the compile payload overflows remote-compile request limits
    (HTTP 413 on the axon tunnel; closures of a few MB, e.g. a
    Mahalanobis estimator, are fine).  ``select`` filters the step's
    dict output to those keys inside the compiled program.

    The scan wrapper is cached per (``step_fn`` object, select,
    captures-mode), so repeated calls with the SAME step-fn object —
    e.g. one scorer across serving waves — compile once per process.
    Callers that rebuild their step fn per call recompile per call;
    keep one step-fn object alive where that matters.  A final partial
    group is padded by repeating its last batch; padding members are
    dropped from the yielded stream.

    Yields ``(question_ids, host_outputs, real_count)`` in input order,
    exactly like :func:`pipelined_map`.
    """
    if chunk <= 1:
        def fn(b):
            out = step_fn(captures, b) if captures is not None else step_fn(b)
            if select is not None:
                out = {k: out[k] for k in select if k in out}
            return out

        yield from pipelined_map(fn, batches)
        return
    import jax

    run = _chunk_runner(step_fn, select, captures is not None)

    def groups():
        buf: list = []
        for item in batches:
            buf.append(item)
            if len(buf) == chunk:
                yield buf
                buf = []
        if buf:
            last = buf[-1]
            while len(buf) < chunk:
                buf.append((last[0], last[1], -1))  # -1 marks padding
            yield buf

    def emit(group, out):
        host = jax.tree_util.tree_map(np.asarray, out)
        for i, (qids, _, real) in enumerate(group):
            if real < 0:
                continue
            yield qids, jax.tree_util.tree_map(lambda a: a[i], host), real

    pending: collections.deque = collections.deque()
    for g in groups():
        pending.append((g, run(captures, tuple(b for _, b, _ in g))))
        if len(pending) > lag:
            g0, out0 = pending.popleft()
            yield from emit(g0, out0)
    while pending:
        g0, out0 = pending.popleft()
        yield from emit(g0, out0)
