"""Drift guard for the committed deployment artifact: every source file
in the package must be byte-identical inside engine.zip (the artifact
spark-submit --py-files actually ships).  Local tests import from the
repo tree, so without this check a stale zip passes every other test
while deploying old code."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ukrainian_ocr_pipeline_spark"


def test_engine_zip_matches_sources():
    with zipfile.ZipFile(os.path.join(REPO, "engine.zip")) as zf:
        members = {n: zf.read(n) for n in zf.namelist() if n.endswith(".py")}
    stale, missing = [], []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO)
            if rel not in members:
                missing.append(rel)
            else:
                with open(path, "rb") as fh:
                    if fh.read() != members[rel]:
                        stale.append(rel)
    assert not missing and not stale, (
        f"engine.zip out of date (missing={missing}, stale={stale}) — "
        f"rebuild with: zip -FSqr engine.zip {PKG} -x '*__pycache__*'")
    extra = [n for n in members if not os.path.exists(os.path.join(REPO, n))]
    assert not extra, f"engine.zip ships deleted files: {extra}"
