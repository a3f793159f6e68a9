"""Recipe-matrix tests (reference ``scripts/<backbone>/<train|test>/*.sh``).

Two layers:

1. a static audit of EVERY script: each ``python -m rgqa_tpu.cli.*``
   invocation must name a real module and pass only flags ``parse_cli``
   accepts (shell variables substituted with dummies);
2. a live smoke run of one generated test script end-to-end against a
   synthetic root (the synthetic generator writes the reference's
   ``GQAUQ_*`` split names so the scripts run unmodified).
"""

import glob
import importlib
import json
import os
import re
import shlex
import subprocess

import pytest

from rgqa_tpu.config import parse_cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*", "*", "*.sh")))

_VAR = re.compile(r"\$\{?(\w+)(?::-[^}]*)?\}?")


def _commands(path):
    """Yield the ``python -m module [flags...]`` argvs in a script."""
    text = open(path).read()
    # join line continuations
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("python -m"):
            continue
        line = _VAR.sub(lambda m: "DUMMY", line)
        argv = [a for a in shlex.split(line) if a != "$@"]
        # strip: python -m <module> ...
        module = argv[2]
        args = argv[3:]
        flags = []
        for i, a in enumerate(args):
            # A standalone substituted var (e.g. $EXTRA) is not a flag
            # value; keep DUMMY only as the value of a preceding --flag.
            if a == "DUMMY" and (i == 0 or not args[i - 1].startswith("--")):
                continue
            flags.append(a)
        yield module, flags


def test_scripts_exist_per_backbone():
    """The matrix mirrors the reference: 12 test + 4 train recipes per
    RGQA backbone (``/root/reference/scripts/``)."""
    ref_tests = {
        "energy", "ensemble", "frcnn", "maha", "mixup", "msp", "odin",
        "qc", "resample", "rp", "rp_with_harduq", "test_all",
    }
    ref_trains = {"mixup", "rp", "rp_with_hard_uq", "vanilla"}
    for bb in ("lxmert", "butd", "uniter"):
        tests = {
            os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(REPO, "scripts", bb, "test", "*.sh"))
        }
        trains = {
            os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(REPO, "scripts", bb, "train", "*.sh"))
        }
        assert ref_tests <= tests, (bb, ref_tests - tests)
        assert ref_trains <= trains, (bb, ref_trains - trains)


@pytest.mark.parametrize(
    "path", SCRIPTS, ids=[os.path.relpath(p, REPO) for p in SCRIPTS]
)
def test_script_flags_parse(path):
    found = 0
    text = open(path).read()
    if "test_all" in path:
        # Chains sibling recipes, each of which must exist.
        chained = re.findall(r'"\$HERE"/(\w+\.sh)', text)
        assert len(chained) >= 3
        for name in chained:
            assert os.path.exists(os.path.join(os.path.dirname(path), name))
        return
    for module, flags in _commands(path):
        found += 1
        importlib.import_module(module)
        if module in ("rgqa_tpu.cli.train", "rgqa_tpu.cli.evaluate",
                      "rgqa_tpu.cli.vqa", "rgqa_tpu.cli.pretrain",
                      "rgqa_tpu.cli.distill"):
            cfg, ns = parse_cli(flags)  # SystemExit on unknown flags
            assert cfg is not None
    assert found >= 1, f"no python invocation found in {path}"


@pytest.mark.slow
def test_generated_script_runs_e2e(tmp_path):
    """Live run: train one epoch via the butd vanilla recipe, then run the
    butd msp test recipe over all 4 GQAUQ subsets."""
    from rgqa_tpu.data.synthetic import SyntheticSpec, make_synthetic_gqa

    data = str(tmp_path / "gqa")
    out = str(tmp_path / "snap")
    make_synthetic_gqa(
        data, SyntheticSpec(n_images=16, n_train=48, n_valid=16, n_testdev=16)
    )
    env = dict(
        os.environ, DATA_ROOT=data, OUTPUT=out, RGQA_PLATFORM="cpu",
        LOAD=os.path.join(out, "butd", "vanilla", "LAST"),
    )
    tiny = [
        "--fp32", "--hidden_size", "32", "--num_heads", "4",
        "--batchSize", "8", "--epochs", "1", "--lr", "1e-3",
    ]
    r = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "butd", "train", "vanilla.sh")]
        + tiny,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(os.path.join(out, "butd", "vanilla", "LAST"))

    r = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "butd", "test", "msp.sh")]
        + tiny,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for subset in ("ClipEasy", "ClipHard", "PTEasy", "PTHard"):
        res = os.path.join(
            out, "butd", "msp",
            f"GQAUQ_testdev_questions_{subset}_result.json",
        )
        assert os.path.exists(res), subset
        with open(res) as f:
            assert "auaf" in json.load(f)


def test_vilt_scripts_exist():
    """ViLT gets the recipe treatment too (the reference ships the
    backbone, ``src/vilt/vilt.py``, without per-method scripts; the
    pixel-based model supports the non-RoI scorers)."""
    tests = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(REPO, "scripts", "vilt", "test", "*.sh"))
    }
    trains = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(REPO, "scripts", "vilt", "train", "*.sh"))
    }
    assert {"msp", "energy", "dropout", "test_all"} <= tests
    assert {"vanilla", "rp"} <= trains


@pytest.mark.slow
def test_vilt_script_runs_e2e(tmp_path):
    """Live run: one-epoch ViLT vanilla train recipe, then the ViLT msp
    test recipe over all 4 GQAUQ subsets (tiny ViT, 64x64 synth images)."""
    from rgqa_tpu.data.synthetic import SyntheticSpec, make_synthetic_gqa

    data = str(tmp_path / "gqa")
    out = str(tmp_path / "snap")
    make_synthetic_gqa(
        data, SyntheticSpec(n_images=16, n_train=32, n_valid=16, n_testdev=16)
    )
    env = dict(
        os.environ, DATA_ROOT=data, OUTPUT=out, RGQA_PLATFORM="cpu",
        LOAD=os.path.join(out, "vilt", "vanilla", "LAST"),
    )
    tiny = [
        "--fp32", "--hidden_size", "32", "--num_heads", "4",
        "--num_layers", "1", "--vilt_image_size", "64",
        "--vilt_patch_size", "16", "--batchSize", "8",
        "--epochs", "1", "--lr", "1e-3",
    ]
    r = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "vilt", "train", "vanilla.sh")]
        + tiny,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(os.path.join(out, "vilt", "vanilla", "LAST"))

    r = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "vilt", "test", "msp.sh")] + tiny,
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for subset in ("ClipEasy", "ClipHard", "PTEasy", "PTHard"):
        res = os.path.join(
            out, "vilt", "msp",
            f"GQAUQ_testdev_questions_{subset}_result.json",
        )
        assert os.path.exists(res), subset
        with open(res) as f:
            assert "auaf" in json.load(f)
