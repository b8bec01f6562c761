"""Tooling tests: viz frame dump + sweep runner (SURVEY.md §4 item 2 and
§2a sweep-scripts row — the reference's GUI inspection and shell sweeps)."""

import glob
import json

from cartpoleplusplus_tpu.sweep import expand_grid, main as sweep_main
from cartpoleplusplus_tpu.viz import main as viz_main


def test_viz_writes_frames(tmp_path):
    out = str(tmp_path / "frames")
    rc = viz_main(["--steps", "3", "--out", out,
                   "--width", "24", "--height", "24"])
    assert rc == 0
    files = sorted(glob.glob(out + "/step*"))
    assert len(files) == 3


def test_expand_grid():
    pts = expand_grid(["a.b=1,2", "c=x"])
    assert pts == [["--a.b", "1", "--c", "x"], ["--a.b", "2", "--c", "x"]]


def test_sweep_end_to_end(tmp_path):
    out = str(tmp_path / "res.jsonl")
    rc = sweep_main([
        "--out", out,
        "--base", ("--agent random --num-envs 8 --total-env-steps 64"),
        "--grid", "seed=0,1",
    ])
    assert rc == 0
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2 and all(r["rc"] == 0 for r in recs)
    assert recs[0]["final"]["episodes"] > 0


def test_plot_run_and_sweep(tmp_path):
    run_log = tmp_path / "run.jsonl"
    run_log.write_text(
        '{"env_steps": 1, "reward_mean": 0.5, "done_frac": 0.3}\n'
        '{"env_steps": 2, "reward_mean": 0.8, "done_frac": 0.1}\n')
    from cartpoleplusplus_tpu.plot import main as plot_main
    out = str(tmp_path / "c.png")
    assert plot_main([str(run_log), "--out", out]) == 0
    assert (tmp_path / "c.png").stat().st_size > 0
    sweep_log = tmp_path / "sweep.jsonl"
    sweep_log.write_text(
        '{"point": 0, "argv": ["--x", "1"], "rc": 0, '
        '"final": {"reward_mean": 0.7}}\n')
    out2 = str(tmp_path / "s.png")
    assert plot_main([str(sweep_log), "--sweep", "--key",
                      "final.reward_mean", "--out", out2]) == 0
