"""LLM-as-a-Judge pipeline (paper_analyses/external_llm_eval equivalent):
prompt construction, verdict parsing, order-corrected tallies, stratified
sampling, and the CLI end-to-end on CSV fixtures."""

import csv
import json
import subprocess
import sys

import numpy as np
import pytest

from procyon_tpu.evaluate import llm_judge as J


class TestPrompts:
    def test_prompt_contains_parts_and_verdict_contract(self):
        entries = [{"entity_id": 1, "question": "What does P1 do?",
                    "references": ["ref one", "ref two"],
                    "ours": "our caption", "baseline": "their caption"}]
        [p] = J.make_judge_prompts(entries, seed=0)
        assert "What does P1 do?" in p.prompt
        assert "- ref one" in p.prompt and "- ref two" in p.prompt
        assert "our caption" in p.prompt and "their caption" in p.prompt
        assert '"[[A]]"' in p.prompt and '"[[C]]"' in p.prompt

    def test_order_randomized_across_entries(self):
        entries = [{"entity_id": i, "question": "q", "references": "r",
                    "ours": "X", "baseline": "Y"} for i in range(32)]
        prompts = J.make_judge_prompts(entries, seed=0)
        sides = {p.ours_is_a for p in prompts}
        assert sides == {True, False}
        # the recorded side matches the prompt layout
        for p in prompts:
            a_block = p.prompt.split("Start Assistant A answer")[1]
            a_answer = a_block.split("End Assistant A answer")[0]
            assert ("X" in a_answer) == p.ours_is_a


class TestVerdictParsing:
    @pytest.mark.parametrize("text,want", [
        ("after comparing ... [[A]]", "A"),
        ("verdict: [[B]]", "B"),
        ("both equally weak [[C]]", "tie"),
        ('use "[[A]]" if A is better ... final: [[B]]', "B"),
        ("no verdict here", None),
        ("", None),
    ])
    def test_cases(self, text, want):
        assert J.parse_judge_verdict(text) == want


class TestTally:
    def test_order_correction(self):
        # ours shown as A and judged A -> win; ours as B judged A -> loss
        prompts = [J.JudgePrompt(1, "", True), J.JudgePrompt(2, "", False),
                   J.JudgePrompt(3, "", True)]
        res = J.tally_judge_results(prompts, ["[[A]]", "[[A]]", "[[C]]"],
                                    n_boot=10)
        assert res["n"] == 3
        assert res["win_rate"] == pytest.approx(1 / 3)
        assert res["loss_rate"] == pytest.approx(1 / 3)
        assert res["tie_rate"] == pytest.approx(1 / 3)

    def test_unparsed_counted_not_scored(self):
        prompts = [J.JudgePrompt(1, "", True), J.JudgePrompt(2, "", True)]
        res = J.tally_judge_results(prompts, ["[[B]]", "garbage"],
                                    n_boot=10)
        assert res["n"] == 1 and res["n_unparsed"] == 1
        assert res["loss_rate"] == 1.0

    def test_bootstrap_ci_brackets_rate(self):
        prompts = [J.JudgePrompt(i, "", True) for i in range(40)]
        resp = ["[[A]]"] * 30 + ["[[B]]"] * 10
        res = J.tally_judge_results(prompts, resp)
        assert res["win_rate_ci_low"] <= res["win_rate"] \
            <= res["win_rate_ci_high"]


class TestStratifiedSample:
    def test_covers_all_strata(self):
        rng = np.random.default_rng(0)
        ids = list(range(500))
        scores = rng.integers(1, 6, 500).astype(float)
        out = J.stratified_sample(ids, scores, 10, n_strata=5, seed=0)
        got_scores = {scores[i] for i in out}
        assert len(got_scores) >= 4  # every populated stratum sampled
        assert len(out) <= 50
        assert len(set(out)) == len(out)

    def test_deterministic(self):
        ids = list(range(100))
        scores = [i % 5 + 1.0 for i in ids]
        a = J.stratified_sample(ids, scores, 5, seed=3)
        b = J.stratified_sample(ids, scores, 5, seed=3)
        assert a == b


class TestReferenceMetrics:
    def test_better_captions_score_higher(self):
        refs = {i: ["protein kinase phosphorylates serine residues"]
                for i in range(4)}
        ours = {i: "protein kinase phosphorylates serine residues"
                for i in range(4)}
        base = {i: "unrelated words entirely" for i in range(4)}
        out = J.reference_metrics(ours, base, refs)
        assert out["ours"]["rouge_l"] > out["baseline"]["rouge_l"]


class TestCLI:
    def test_pipeline_end_to_end(self, tmp_path):
        def write(path, header, rows):
            with open(path, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(header)
                w.writerows(rows)

        ours = tmp_path / "ours.csv"
        base = tmp_path / "base.csv"
        refs = tmp_path / "refs.csv"
        write(ours, ["entity_id", "caption"],
              [[i, f"kinase activity caption {i}"] for i in range(4)])
        write(base, ["entity_id", "caption"],
              [[i, f"baseline text {i}"] for i in range(4)])
        write(refs, ["entity_id", "reference"],
              [[i, f"kinase activity caption {i}"] for i in range(4)]
              + [[0, "second reference"]])

        env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
               "HOME": "/root"}
        prompts_csv = tmp_path / "prompts.csv"
        r = subprocess.run(
            [sys.executable, "scripts/llm_judge_pipeline.py", "prompts",
             "--ours", str(ours), "--baseline", str(base),
             "--references", str(refs), "--out", str(prompts_csv)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        assert json.loads(r.stdout.strip().splitlines()[-1])["prompts"] == 4

        # synthetic judge: always prefers "kinase activity" (= ours)
        rows = list(csv.DictReader(open(prompts_csv)))
        resp = tmp_path / "responses.csv"
        with open(resp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["entity_id", "response"])
            for row in rows:
                v = "[[A]]" if int(row["ours_is_a"]) else "[[B]]"
                w.writerow([row["entity_id"], f"ours is better {v}"])
        r = subprocess.run(
            [sys.executable, "scripts/llm_judge_pipeline.py", "tally",
             "--prompts", str(prompts_csv), "--responses", str(resp)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert res["win_rate"] == 1.0

        r = subprocess.run(
            [sys.executable, "scripts/llm_judge_pipeline.py", "refscore",
             "--ours", str(ours), "--baseline", str(base),
             "--references", str(refs)],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert res["ours"]["rouge_l"] > res["baseline"]["rouge_l"]
