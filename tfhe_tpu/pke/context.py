"""Unified CryptoContext factory for the pke schemes.

The analogue of the reference's `GenCryptoContext` / `CCParams<...>` front
door (gen-cryptocontext.h, cryptocontextfactory.cpp): one entry point that
dispatches to BFV/BGV/CKKS with scheme-appropriate defaults.
"""

from __future__ import annotations

from .bfv import BFVContext, BFVParams
from .bgv import BGVContext, BGVParams
from .ckks import CKKSContext, CKKSParams


def gen_crypto_context(scheme: str, *, N: int = 4096, mult_depth: int = 1,
                       plaintext_modulus: int = 257, scale_bits: int = 40,
                       limb_bits: int = 54, seed: int | None = None):
    """GenCryptoContext analogue.

    scheme: "BFV" | "BGV" | "CKKS".
    For BFV/BGV: `plaintext_modulus` (prime t = 1 mod 2N enables packed
    encoding). For CKKS: `scale_bits` sets the default encoding scale.
    """
    s = scheme.upper()
    if s in ("BFV", "BFVRNS"):
        return BFVContext(BFVParams.create(N=N, t=plaintext_modulus,
                                           mult_depth=mult_depth,
                                           limb_bits=limb_bits), seed=seed)
    if s in ("BGV", "BGVRNS"):
        return BGVContext(BGVParams.create(N=N, t=plaintext_modulus,
                                           mult_depth=mult_depth,
                                           limb_bits=limb_bits), seed=seed)
    if s in ("CKKS", "CKKSRNS"):
        return CKKSContext(CKKSParams.create(N=N, mult_depth=mult_depth,
                                             scale_bits=scale_bits,
                                             limb_bits=min(limb_bits, 50)),
                           seed=seed)
    raise ValueError(f"unknown scheme {scheme!r} (BFV, BGV, or CKKS)")
