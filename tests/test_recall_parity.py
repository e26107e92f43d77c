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
