"""Guard the end-of-round verification ledger (VERDICT r7 directive 1).

Three rounds running the repo shipped with a stale VERIFIED.md and/or
untracked CORRECTNESS/BENCH artifacts.  This test makes the suite fail
whenever the on-disk ledger does not match a fresh regeneration from
CORRECTNESS_r*.json + the live registry, so any registry edit (new
query, rotation change) or newly-landed correctness artifact forces
``python scripts/verified_ledger.py`` before the suite goes green.

No Spark session needed — pure file/registry comparison.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from verified_ledger import render  # noqa: E402


def test_verified_md_is_current():
    content, _ = render(REPO)
    with open(os.path.join(REPO, "VERIFIED.md")) as f:
        on_disk = f.read()
    assert on_disk == content, (
        "VERIFIED.md is stale — run `python scripts/verified_ledger.py` "
        "after editing the registry or landing a CORRECTNESS_r*.json"
    )


def test_no_never_green_outside_gate_window():
    _, out_of_window = render(REPO)
    assert not out_of_window, (
        "never-green queries outside the 50-entry gate window: "
        f"{out_of_window} — fix _CHECK_FIRST/_ROTATE_OUT in queries.py"
    )
