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
