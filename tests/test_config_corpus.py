"""Every native config file must merge to the IDENTICAL FullConfig as
loading the same-named reference experiment file through the loader
(reference arguments/{dynerf,hypernerf,technicolor,nersemble}/*.py) — so a
user can run every headline reference experiment without reaching into the
reference tree."""

import dataclasses
import os

import pytest

from ed3dgs_tpu.config.loader import load_full_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/arguments"
OURS = os.path.join(REPO, "configs")

FAMILIES = ("dynerf", "hypernerf", "technicolor", "nersemble")


def _pairs():
    out = []
    for fam in FAMILIES:
        ref_dir = os.path.join(REF, fam)
        if not os.path.isdir(ref_dir):
            continue
        for name in sorted(os.listdir(ref_dir)):
            if not name.endswith(".py"):
                continue
            ours = os.path.join(OURS, fam, name)
            if os.path.exists(ours):
                out.append((fam, name))
    return out


PAIRS = _pairs()


def test_corpus_is_complete():
    """Every reference experiment file has a native counterpart."""
    missing = []
    for fam in FAMILIES:
        ref_dir = os.path.join(REF, fam)
        if not os.path.isdir(ref_dir):
            continue
        for name in sorted(os.listdir(ref_dir)):
            if name.endswith(".py") and not os.path.exists(
                    os.path.join(OURS, fam, name)):
                missing.append(f"{fam}/{name}")
    assert not missing, missing


@pytest.mark.parametrize("fam,name", PAIRS,
                         ids=[f"{f}/{n}" for f, n in PAIRS])
def test_native_config_matches_reference(fam, name):
    ours = load_full_config(os.path.join(OURS, fam, name))
    ref = load_full_config(os.path.join(REF, fam, name))
    for field in dataclasses.fields(ours):
        a = getattr(ours, field.name)
        b = getattr(ref, field.name)
        assert a == b, f"{field.name}: {a!r} != {b!r}"
