"""Numpy oracle for the Arrow-style pair-HMM (polish likelihood core).

Role parity: [U] ConsensusCore2 / GenomicConsensus "Arrow" — per-window
template-vs-read forward likelihood with iterative template mutation
testing (SURVEY.md §2b, §3.4).  This oracle defines the exact numeric
spec (op order included) for ``ops.pairhmm``:

States: M (match/mismatch), I (insertion in read), D (deletion in read).
  M[i,j] = em(i,j) + lse(M[i-1,j-1]+tMM, I[i-1,j-1]+tIM, D[i-1,j-1]+tDM)
  I[i,j] = log(1/4) + lse(M[i-1,j]+tMI, I[i-1,j]+tII)
  D[i,j] =            lse(M[i,j-1]+tMD, D[i,j-1]+tDD)
  lse(a, b, c) = logaddexp(logaddexp(a, b), c)   [fixed nesting order]
  loglik = lse(M[n,m], I[n,m], D[n,m])
Initialization: M[0,0] = 0, everything else -inf.
"""
from __future__ import annotations

import dataclasses

import numpy as np

NEG = np.float32(-1e30)


@dataclasses.dataclass
class HMMParams:
    e_sub: float = 0.02      # substitution emission error
    p_ins: float = 0.05      # M->I
    p_del: float = 0.05      # M->D
    eps_ins: float = 0.20    # I->I
    eps_del: float = 0.20    # D->D

    def logs(self):
        l = np.log
        return {
            "em_match": np.float32(l(1.0 - self.e_sub)),
            "em_mis": np.float32(l(self.e_sub / 3.0)),
            "em_ins": np.float32(l(0.25)),
            "tMM": np.float32(l(1.0 - self.p_ins - self.p_del)),
            "tMI": np.float32(l(self.p_ins)),
            "tMD": np.float32(l(self.p_del)),
            "tIM": np.float32(l(1.0 - self.eps_ins)),
            "tII": np.float32(l(self.eps_ins)),
            "tDM": np.float32(l(1.0 - self.eps_del)),
            "tDD": np.float32(l(self.eps_del)),
        }


def forward_full(q: np.ndarray, t: np.ndarray,
                 params: HMMParams | None = None) -> float:
    """Full O(nm) forward log-likelihood (float32 accumulation)."""
    params = params or HMMParams()
    L = params.logs()
    n, m = len(q), len(t)
    M = np.full((n + 1, m + 1), NEG, np.float32)
    I = np.full((n + 1, m + 1), NEG, np.float32)
    D = np.full((n + 1, m + 1), NEG, np.float32)
    M[0, 0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            if i > 0 and j > 0:
                em = L["em_match"] if (q[i - 1] == t[j - 1] and q[i - 1] < 4) \
                    else L["em_mis"]
                M[i, j] = em + np.logaddexp(
                    np.logaddexp(M[i - 1, j - 1] + L["tMM"],
                                 I[i - 1, j - 1] + L["tIM"]),
                    D[i - 1, j - 1] + L["tDM"])
            if i > 0:
                I[i, j] = L["em_ins"] + np.logaddexp(
                    M[i - 1, j] + L["tMI"], I[i - 1, j] + L["tII"])
            if j > 0:
                D[i, j] = np.logaddexp(M[i, j - 1] + L["tMD"],
                                       D[i, j - 1] + L["tDD"])
    return float(np.logaddexp(np.logaddexp(M[n, m], I[n, m]), D[n, m]))


def score_templates(reads: list[np.ndarray], template: np.ndarray,
                    params: HMMParams | None = None) -> float:
    """Total log-likelihood of all reads given a template."""
    return float(sum(forward_full(r, template, params) for r in reads))


def mutations_of(template: np.ndarray, pos: int):
    """All single-base variants at pos: 3 subs, 1 del, 4 ins (before pos)."""
    out = []
    for b in range(4):
        if b != template[pos]:
            v = template.copy()
            v[pos] = b
            out.append((f"sub{pos}:{b}", v))
    v = np.delete(template, pos)
    out.append((f"del{pos}", v))
    for b in range(4):
        v = np.insert(template, pos, b)
        out.append((f"ins{pos}:{b}", v))
    return out


def polish_window_oracle(template: np.ndarray, reads: list[np.ndarray],
                         candidate_pos: list[int],
                         params: HMMParams | None = None,
                         max_rounds: int = 5) -> np.ndarray:
    """Greedy mutation search: apply the best improving single mutation per
    round among candidates until no improvement (Arrow's outer loop)."""
    params = params or HMMParams()
    cur = template.copy()
    cur_ll = score_templates(reads, cur, params)
    for _ in range(max_rounds):
        best = None
        for p in candidate_pos:
            if p >= len(cur):
                continue
            for name, v in mutations_of(cur, p):
                ll = score_templates(reads, v, params)
                if ll > cur_ll + 1e-3 and (best is None or ll > best[0]):
                    best = (ll, name, v)
        if best is None:
            break
        cur_ll, _, cur = best
    return cur
