"""The driver's multi-chip dryrun, run literally as a test.

Round-3 shipped a red MULTICHIP artifact because an assert was added to
``__graft_entry__.dryrun_multichip`` without ever executing it; this test
calls the exact driver entry point on the 8-device virtual CPU mesh so
the artifact can never silently rot again (round-3 verdict #1b).
"""

import sys

import pytest

pytestmark = pytest.mark.slow


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")
