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

Example:
    printf '%s\\n' '{"question_id": "q1", "sent": "is there a car?", "img_id": "synth_0"}' |
    python -m rgqa_tpu.cli.serve --synthetic --data_root /tmp/gqa \\
        --test testdev --load snap/smoke/BEST --scorer msp
"""

from __future__ import annotations

import json
import sys

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


def _waves(lines, wave_size):
    """Group raw input lines into waves; parsing happens per record in
    the serving loop so one bad line cannot kill the stream."""
    wave = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        wave.append(line)
        if len(wave) >= wave_size:
            yield wave
            wave = []
    if wave:
        yield wave


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
    scorer = runner.make_scorer()
    vocab_ds = runner.dataset

    wave_size = cfg.train.batch_size * _WAVE_BATCHES
    served = 0
    for wave in _waves(stdin, wave_size):
        rows, errors = [], []
        for line in wave:
            try:
                rec = json.loads(line)
                if not isinstance(rec, dict):
                    raise ValueError("record must be a JSON object")
                row = _normalize(rec)
                if row["img_id"] not in runner.features:
                    raise KeyError(f"unknown img_id {row['img_id']!r}")
                rows.append(row)
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
        stdout.flush()
        served += len(rows)
    print(f"served {served} questions", file=sys.stderr)
    return served


if __name__ == "__main__":
    main()
