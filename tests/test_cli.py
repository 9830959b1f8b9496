"""spark-submit surface: zip packaging + the crawl/seed CLI
(tools/crawl_submit.py, the crawl-schedule analog) run as real
subprocesses against the tiny fixture."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_zip_packages_every_module(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import build_zip

    out = build_zip.build(str(tmp_path / "crawl_spark.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "crawl_spark/plans/engine.py" in names
    assert "crawl_spark/operators/topk.py" in names
    assert "crawl_spark/streaming/feed.py" in names
    assert not any("__pycache__" in n for n in names)


def test_crawl_cli_end_to_end(tiny_fixture, tmp_path):
    """`crawl_submit.py seed` stages out-of-band URLs; `crawl` drains the
    staging dir, runs rounds, prints a JSON summary."""
    env = dict(os.environ, PYTHONPATH=ROOT)
    staging = str(tmp_path / "staged")
    wd = str(tmp_path / "wd")

    seed = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "tools", "crawl_submit.py"),
            "seed", "--staging", staging,
            "--url", "http://host1.example/p/1", "http://host2.example/p/2",
            "ht tp://\x01bad",
            "--callback", "page",
        ],
        capture_output=True, text=True, env=env, cwd=ROOT,
    )
    assert "staged 2 seeds" in seed.stdout, seed.stderr[-1500:]

    crawl = subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "tools", "crawl_submit.py"),
            "crawl",
            "--pages", tiny_fixture["pages"],
            "--seeds", tiny_fixture["seeds"],
            "--robots", tiny_fixture["robots"],
            "--workdir", wd, "--rounds", "2", "--batch-cap", "30",
            "--staging", staging,
        ],
        capture_output=True, text=True, env=env, cwd=ROOT,
    )
    lines = [l for l in crawl.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, crawl.stderr[-2000:]
    summary = json.loads(lines[-1])
    assert summary["rounds"] == 2 and summary["fetched"] > 0
    assert os.path.exists(os.path.join(wd, "round_00001", "manifest.json"))
