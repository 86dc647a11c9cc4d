"""Reference fc_*.py console-script compatibility shims.

Role parity: [U] setup.py entry_points (SURVEY.md §1 L4) — each legacy
tool name forwards to the corresponding subcommand of the unified CLI.
"""
from __future__ import annotations

import sys

from . import main


def _fwd(cmd: str):
    return main([cmd] + sys.argv[1:])


def fc_unzip() -> int:
    return _fwd("unzip")


def fc_quiver() -> int:
    return _fwd("quiver")


def fc_phasing() -> int:
    return _fwd("phase")


def fc_ovlp_filter() -> int:
    return _fwd("ovlp-filter")


def fc_track() -> int:
    return _fwd("track")


def fc_dedup() -> int:
    return _fwd("dedup")


def fc_gen_gfa() -> int:
    return _fwd("gen-gfa")
