"""CLI smoke tests: drive the user-facing scripts end-to-end in subprocesses,
exactly the way a user would (`--synthetic`).

The reference ships no script-level tests (SURVEY.md §4); its CLIs
(caption_bulk.py, qa_filter_captions.py, run_eval_framework.py) are the
user-facing surface the parity audit checks, so we lock them here.  The
caption test additionally asserts the three beam backends (dense cache,
paged pool, paged pool + shared-prefix page dedup) emit IDENTICAL captions
— on the CPU f32 "ref" backend the paths are bit-exact by construction
(tests/test_paged_beam.py proves it at the token level; this proves it at
the CLI level, through the collator + tokenizer + CSV writer).
"""
import csv
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(script, *args, timeout=600):
    env = dict(os.environ)
    env["PROCYON_PLATFORM"] = "cpu"   # package hook: beats the axon pin
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert proc.returncode == 0, (
        f"{script} {' '.join(args)} failed:\n{proc.stdout}\n{proc.stderr}")
    return proc.stdout


def read_captions(path):
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["protein_id", "caption"]
    return rows[1:]


@pytest.fixture(scope="module")
def caption_csvs(tmp_path_factory):
    """Run caption_bulk once per backend; shared by the qa_filter test."""
    d = tmp_path_factory.mktemp("cli")
    outs = {}
    for tag, extra in (
        ("dense", ()),
        ("paged", ("--paged",)),
        ("shared", ("--paged", "--shared_prefix")),
    ):
        out = str(d / f"captions_{tag}.csv")
        run_cli("caption_bulk.py", "--synthetic", "--n_proteins", "4",
                "--batch_size", "4", "--max_new_tokens", "8",
                "--beam_size", "4", "--beam_group_size", "2",
                "--out", out, *extra)
        outs[tag] = out
    return outs


def test_caption_bulk_backends_agree(caption_csvs):
    dense = read_captions(caption_csvs["dense"])
    assert len(dense) == 4
    assert all(len(c) > 0 for _, c in dense)
    assert read_captions(caption_csvs["paged"]) == dense
    assert read_captions(caption_csvs["shared"]) == dense


def test_qa_filter_captions(caption_csvs, tmp_path):
    out = str(tmp_path / "filtered.csv")
    run_cli("qa_filter_captions.py", "--synthetic",
            "--captions", caption_csvs["dense"], "--out", out)
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    assert rows, "qa_filter wrote an empty file"
    # kept subset of the input ids (threshold on random weights may keep
    # anything from none to all; the contract is a valid subset CSV)
    in_ids = {r[0] for r in read_captions(caption_csvs["dense"])}
    assert {r[0] for r in rows[1:]} <= in_ids


def test_bench_serving_synthetic():
    stdout = run_cli("bench_serving.py", "--synthetic")
    line = [l for l in stdout.strip().splitlines()
            if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["metric"] == "serving_requests_per_sec"
    assert result["value"] > 0
    assert result["n_tokens"] > 0
    assert 0 < result["slot_utilization"] <= 1


def test_run_eval_framework_synthetic(tmp_path):
    out_dir = str(tmp_path / "eval")
    run_cli("run_eval_framework.py", "--synthetic",
            "--output_dir", out_dir, "--models", "random",
            "--tasks", "retrieval")
    results = os.path.join(out_dir, "retrieval_metrics.tsv")
    assert os.path.exists(results)
    with open(results) as f:
        body = f.read()
    assert body.startswith("model\tdataset\tmetric\tvalue")
    assert "random" in body
