"""Execute the reference's config-test corpus DIRECTLY from YAML.

Round-1 transcribed ~10 cases by hand (test_reference_goldens.py);
with the Bloblang compiler + YAML runner + the AWK-subset interpreter
the corpus now runs verbatim: EVERY yaml file under
/root/reference/config/test/ (protobuf/ holds schemas, not tests).
"""

from __future__ import annotations

import glob
import os

import pytest

from bento_ray.config import run_config_tests

CORPUS = "/root/reference/config/test"

SKIP: dict = {}


def _files():
    out = []
    for sub in ("", "bloblang", "cookbooks", "resources", "protobuf"):
        for f in sorted(glob.glob(os.path.join(CORPUS, sub, "*.yaml"))):
            name = os.path.basename(f)
            if name in SKIP:
                continue
            out.append(f)
    return out


@pytest.mark.parametrize(
    "path", _files(), ids=lambda p: os.path.relpath(p, CORPUS))
def test_reference_config_corpus(path):
    results = run_config_tests(path)
    assert results, f"no cases ran for {path}"
    assert all(r["ok"] for r in results)


def test_corpus_case_count():
    total = sum(len(run_config_tests(f)) for f in _files())
    assert total >= 59
