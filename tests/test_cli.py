"""CLI (ray job submit form) smoke test — fresh process, own Ray session."""

import json
import os
import subprocess
import sys


def test_cli_splits(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "bioner_ray.cli",
            "splits",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            str(tmp_path / "splits"),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    counts = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(counts) == {"train", "val", "test"} and sum(counts.values()) == 500
