"""Driver multichip dryrun at pod-ish scale (SURVEY.md §2.4).

dryrun_multichip is environment-self-contained: called from this 8-device
test process with n=32, it re-executes itself in a subprocess with 32 virtual
CPU devices and runs the sharded train step + expert-parallel forward on an
8×4 mesh — the layout check VERDICT round 2 asked to push past 8 devices."""

import sys

import pytest


def test_mesh_layout_scaling():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    assert g._mesh_layout(1) == (1, 1)
    assert g._mesh_layout(8) == (4, 2)
    assert g._mesh_layout(16) == (4, 4)
    assert g._mesh_layout(32) == (8, 4)


@pytest.mark.slow
def test_dryrun_32_devices_8x4_mesh():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    # this process has 8 virtual devices (conftest) < 32 → subprocess path
    g.dryrun_multichip(32)
