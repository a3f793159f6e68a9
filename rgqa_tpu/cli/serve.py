"""Production scoring service: JSONL questions in -> scored JSONL out.

Reads question records from stdin (one JSON object per line), answers
and rejection-scores them in waves through the full production pipeline
— host encode (tokenize + RoI feature lookup) -> ``device_prefetch``
bf16 feed -> ``--eval_chunk`` grouped dispatch -> lagged output fetch —
and writes one JSON line per question:

    {"questionId": ..., "prediction": ..., "confidence": ...}

i.e. exactly the ``compute_accfpr``-compatible prediction contract
(reference ``gqa_data.py:583-605``), so the stream can be piped
straight into ``python -m rgqa_tpu.metrics.compute_accfpr``.

Input records need ``question_id`` (or ``questionId``), ``sent``, and
``img_id`` (an image whose RoI features exist under
``<data_root>/features``).  Unknown images are reported on the record
itself (``{"error": ...}``) without stopping the stream.

The reference has no serving path — its eval loop is bound to on-disk
splits (``src/tasks/gqa_conf.py:297-333``).  This is the deployment
face of the same scoring stack: any ``--scorer`` (msp/energy/odin/
maha/dropout/branched), any backbone, ``--tau`` unused (raw confidence
is emitted; thresholding is the consumer's call).

Latency: ``--wave_timeout`` (default 50 ms) bounds how long a pending
record waits for its wave to fill — a lone record pays one WAVE COST
plus the timeout, instead of blocking until ``batch_size * 64`` peers
arrive.  The wave cost scales with ``--batchSize`` (a 1-record wave
pads to the compiled batch): measured ~1.2 s at batch 128 vs 86 ms at
batch 8 on the tunneled v5e, at no sustained-throughput cost on that
wire-bound link — run a latency tier at a small ``--batchSize``
(docs/kernels.md "Serving latency").  ``--serve_stats`` reports
per-record latency (arrival -> result written) p50/p95/p99 as one JSON
line on stderr at shutdown.

Example:
    printf '%s\\n' '{"question_id": "q1", "sent": "is there a car?", "img_id": "synth_0"}' |
    python -m rgqa_tpu.cli.serve --synthetic --data_root /tmp/gqa \\
        --test testdev --load snap/smoke/BEST --scorer msp
"""

from __future__ import annotations

import json
import queue as _queue
import sys
import threading
import time

from rgqa_tpu.config import parse_cli
from rgqa_tpu.data import GQADataset
from rgqa_tpu.runner import GQARunner

# Questions per scoring wave: large enough that the pipeline (prefetch +
# chunked dispatch + lagged fetch) reaches steady state, small enough to
# bound latency and host memory.
_WAVE_BATCHES = 64


def _normalize(rec: dict) -> dict:
    qid = rec.get("question_id", rec.get("questionId"))
    if qid is None or "sent" not in rec or "img_id" not in rec:
        raise ValueError(
            "record needs question_id/questionId, sent, img_id: "
            f"{sorted(rec)}"
        )
    return {"question_id": str(qid), "sent": rec["sent"],
            "img_id": rec["img_id"], "label": rec.get("label", {})}


def _waves(lines, wave_size, timeout: float = 0.0):
    """Group raw input lines into waves of ``(line, t_arrival)`` pairs.

    Shallow-queue policy: a reader thread pulls lines as they arrive; a
    wave is dispatched when it is FULL, or when the oldest pending
    record has waited ``timeout`` seconds with the input idle — so a
    lone record never waits for ``wave_size`` peers (at a full wave's
    batch-pipeline efficiency cost, paid only when the queue is
    shallow).  ``timeout=0`` restores strict full waves.  Parsing
    happens per record in the serving loop so one bad line cannot kill
    the stream."""
    q: _queue.Queue = _queue.Queue(maxsize=wave_size * 2)
    _END = object()

    def reader():
        try:
            for line in lines:
                line = line.strip()
                if line:
                    q.put((line, time.perf_counter()))
        except BaseException as e:  # surface input errors on the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    wave: list = []
    done = False
    while not done:
        if wave and timeout > 0:
            wait = timeout - (time.perf_counter() - wave[0][1])
            if wait <= 0:
                yield wave
                wave = []
                continue
        else:
            wait = None
        try:
            item = q.get(timeout=wait)
        except _queue.Empty:
            continue  # oldest record timed out -> dispatch at loop top
        if item is _END:
            done = True
        elif isinstance(item, BaseException):
            if wave:
                yield wave  # serve what arrived before the input died
            raise item
        else:
            wave.append(item)
            if len(wave) >= wave_size:
                yield wave
                wave = []
    if wave:
        yield wave


class _LatencyStats:
    """Per-record service latency (arrival -> result written)."""

    def __init__(self):
        self.samples: list = []

    def record(self, t_arrival: float):
        self.samples.append(time.perf_counter() - t_arrival)

    def summary(self) -> dict:
        import numpy as np

        if not self.samples:
            return {"count": 0}
        s = np.asarray(self.samples)
        return {
            "count": int(len(s)),
            "p50_ms": round(float(np.percentile(s, 50)) * 1e3, 2),
            "p95_ms": round(float(np.percentile(s, 95)) * 1e3, 2),
            "p99_ms": round(float(np.percentile(s, 99)) * 1e3, 2),
            "max_ms": round(float(s.max()) * 1e3, 2),
        }


def main(argv=None, stdin=None, stdout=None):
    cfg, ns = parse_cli(argv)
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    # --valid defaults to "valid", so check --test explicitly: the
    # vocabulary split must be a deliberate choice in a deployment.
    if not cfg.data.test_splits:
        raise SystemExit(
            "--test <split> is required (answer-vocabulary source)"
        )

    runner = GQARunner(cfg, init_train=cfg.ood.scorer == "maha")
    if cfg.train.use_bf16:
        # Serving holds no optimizer state, so the f32 master params are
        # dead weight here: bf16 resident params halve the per-forward
        # HBM weight traffic and resident memory (bench.py's serving
        # convention; one jitted cast — see cast_params_bf16).  The
        # one-time f32 param UPLOAD already happened inside the runner's
        # load path, so this does not shrink init cost — a host-side
        # restore-and-cast would, noted as future work in
        # docs/kernels.md "Serving latency".  A bf16 model computes in
        # bf16 either way; --fp32 keeps exact f32 serving.  Grad-at-eval
        # scorers' input-precision exemptions apply to the FEED, not the
        # resident params.
        from rgqa_tpu.runner import cast_params_bf16

        runner.params = cast_params_bf16(runner.params)
    scorer = runner.make_scorer()
    vocab_ds = runner.dataset

    wave_size = cfg.train.batch_size * _WAVE_BATCHES
    stats = _LatencyStats() if getattr(ns, "serve_stats", False) else None
    timeout = float(getattr(ns, "wave_timeout", 0.05) or 0.0)
    served = 0
    for wave in _waves(stdin, wave_size, timeout=timeout):
        rows, arrivals, errors = [], {}, []
        for line, t_in in wave:
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError("record must be a JSON object")
                row = _normalize(rec)
                if row["img_id"] not in runner.features:
                    raise KeyError(f"unknown img_id {row['img_id']!r}")
                rows.append(row)
                arrivals[row["question_id"]] = t_in
            except Exception as e:  # report, never stop the stream
                errors.append({"record": line, "error": str(e)})
        for err in errors:
            print(json.dumps(err), file=stdout)
        if not rows:
            stdout.flush()
            continue
        ds = GQADataset.from_rows(
            rows,
            ans2label=vocab_ds.ans2label,
            label2ans=vocab_ds.label2ans,
            name="serve",
        )
        encoded = runner._encode(ds)
        quesid2ans = runner.score_split(encoded, scorer=scorer)
        for row in rows:
            ans, score = quesid2ans[row["question_id"]]
            print(
                json.dumps(
                    {
                        "questionId": row["question_id"],
                        "prediction": ans,
                        "confidence": round(float(score), 4),
                    }
                ),
                file=stdout,
            )
            if stats is not None:
                stats.record(arrivals[row["question_id"]])
        stdout.flush()
        served += len(rows)
    print(f"served {served} questions", file=sys.stderr)
    if stats is not None:
        print(json.dumps({"latency": stats.summary()}), file=sys.stderr)
    return served


if __name__ == "__main__":
    main()
