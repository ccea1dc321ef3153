"""HE-standard lattice parameter table (ternary secret distribution).

Mirrors `src/core/lib/lattice/stdlatticeparms.cpp:110-180` and the lookup rule
`StdLatticeParm::FindRingDim` (stdlatticeparms.h:151-166): the smallest ring
dimension whose max log2(Q) bound is >= the requested logQ.
"""

from __future__ import annotations

# {security level: [(ring_dim, max_logQ), ...]} for ternary secrets
_TERNARY_MAX_LOGQ = {
    "128_classic": [(1024, 27), (2048, 54), (4096, 109), (8192, 218), (16384, 438), (32768, 881), (65536, 1772)],
    "192_classic": [(1024, 19), (2048, 37), (4096, 75), (8192, 152), (16384, 305), (32768, 611), (65536, 1228)],
    "256_classic": [(1024, 14), (2048, 29), (4096, 58), (8192, 118), (16384, 237), (32768, 476), (65536, 956)],
    "128_quantum": [(1024, 25), (2048, 51), (4096, 101)],
    "192_quantum": [(1024, 17), (2048, 35), (4096, 70)],
    "256_quantum": [(1024, 13), (2048, 27), (4096, 54)],
}


def find_ring_dim(sec_level: str, log_q: int) -> int:
    """Smallest standard ring dimension satisfying `sec_level` for modulus size log_q."""
    table = _TERNARY_MAX_LOGQ[sec_level]
    prev = 0
    n = 0
    for ring_dim, max_log_q in table:
        if log_q <= max_log_q and log_q > prev:
            return ring_dim
        prev = max_log_q
        n = ring_dim
    return 2 * n
