"""End-to-end recall parity: the torch-oracle map build and the flax-stack
map build (one weight set, ported) must index landmarks identically
(tools/recall_parity.py; the north-star metric from BASELINE.md)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_recall_parity_tiny(capsys):
    pytest.importorskip("torch")
    from tools.recall_parity import main

    assert main(["--tiny"]) == 0
    out = capsys.readouterr().out
    assert "RECALL PARITY: PASS" in out


def test_recall_parity_medium(capsys):
    """Medium scale (VERDICT r4 #8): 12-layer width-256 towers with the
    real hook spacing pattern over 192x192 frames — build-and-index
    agreement beyond toy scale (IoU >= 0.97 with the documented
    boundary-ulp allowance, top-1 agreement ~1.0)."""
    pytest.importorskip("torch")
    import json

    from tools.recall_parity import main

    assert main(["--medium"]) == 0
    out = capsys.readouterr().out
    assert "RECALL PARITY: PASS" in out
    report = json.loads(out[out.index("{"):out.rindex("}") + 1])
    assert report["mode"] == "medium-synthetic"
    assert report["top1_agreement"] > 0.995
    assert report["feature_cos_min"] > 0.99
