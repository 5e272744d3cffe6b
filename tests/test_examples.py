"""Keep examples/ honest: every file must compile and every
``QUERIES["..."]`` key it references must exist in the registry —
the cheap guard against silent rot when queries are renamed.
One representative example also runs end-to-end at sf0.001.
"""

from __future__ import annotations

import os
import py_compile
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    os.path.join(REPO, "examples", f)
    for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=os.path.basename)
def test_example_compiles_and_references_live_queries(path):
    py_compile.compile(path, doraise=True)
    from kafka_etl_consumer_spark.plans import QUERIES

    src = open(path).read()
    referenced = re.findall(r"QUERIES\[\s*[\"']([^\"']+)[\"']\s*\]", src)
    missing = [n for n in referenced if n not in QUERIES]
    assert not missing, f"{os.path.basename(path)} references dead queries: {missing}"


@pytest.mark.slow
def test_experimentation_example_runs_end_to_end():
    # one real run (the cheapest example with broad query coverage) so a
    # runtime break — not just a rename — also fails CI
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "experimentation_example.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "report" in proc.stdout or "==" in proc.stdout
