"""Driver entry-point contract tests (small variants of what the driver runs)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_small():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)


def test_dryrun_multichip_odd():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(1)
