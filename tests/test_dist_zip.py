"""The spark-submit artifact must byte-match the source tree.

ADVICE r2 (medium): the committed dist/aws_log_ingestion_spark.zip went
stale after later commits changed operators — spark-submit --py-files
reads the ZIP, not the tree, so a stale zip silently runs old code. This
test makes zip drift a test failure: every package .py must be present in
the zip with identical bytes, and the zip must not carry files the tree
no longer has. Fix is `scripts/make_pyfiles.sh`.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "aws_log_ingestion_spark"
ZIP = os.path.join(REPO, "dist", f"{PKG}.zip")


def _tree_files() -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, REPO)] = fh.read()
    return out


def test_dist_zip_matches_source_tree():
    assert os.path.exists(ZIP), "dist zip missing — run scripts/make_pyfiles.sh"
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: z.read(n) for n in z.namelist() if n.endswith(".py")}
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    assert not missing and not extra, f"zip drift: missing={missing} extra={extra}"
    stale = sorted(n for n in tree if tree[n] != zipped[n])
    assert not stale, f"zip stale for {stale} — re-run scripts/make_pyfiles.sh"
