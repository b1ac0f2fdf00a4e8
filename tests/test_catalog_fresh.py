"""CATALOG.md must match the registry (regenerate with
scripts/gen_catalog.py after adding queries)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_catalog_is_fresh():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import gen_catalog

    with open(os.path.join(REPO, "CATALOG.md")) as fh:
        assert fh.read() == gen_catalog.render()
