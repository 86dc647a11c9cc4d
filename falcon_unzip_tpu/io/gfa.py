"""GFA-1 emitter for the unzipped assembly.

Role parity: [U] falcon_unzip/mains/unzip_gen_gfa_v1.py — GFA-1 of
p_ctg + h_ctg with haplotig placement edges (SURVEY.md §2a).
"""
from __future__ import annotations

import os

from ..seq import decode


def write_gfa(path: str, p_ctg, h_ctg, placements=None,
              include_seq: bool = True) -> None:
    """p_ctg: [(name, seq, reads)], h_ctg: list[Haplotig]."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("H\tVN:Z:1.0\n")
        for name, seq, _ in p_ctg:
            s = decode(seq) if include_seq else "*"
            fh.write(f"S\t{name}\t{s}\tLN:i:{len(seq)}\n")
        for h in h_ctg:
            s = decode(h.seq) if include_seq else "*"
            fh.write(f"S\t{h.name}\t{s}\tLN:i:{len(h.seq)}\n")
        # placement edges: haplotig attaches to its primary at p_start/p_end
        for h in h_ctg:
            fh.write(f"L\t{h.primary}\t+\t{h.name}\t+\t0M\t"
                     f"SP:i:{h.p_start}\tEP:i:{h.p_end}\n")
