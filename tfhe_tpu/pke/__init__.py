"""PKE module: RNS/DCRT lattice arithmetic and the BFV scheme family.

The counterpart of the reference's `src/pke` (SURVEY.md §2.3): CryptoContext
front-end, RNS machinery over DCRT polynomials, and scheme implementations.
Round 1 ships the DCRT layer, BFVrns (keygen / encrypt / decrypt / add / sub /
neg / exact mult / relinearize), BGVrns (t-scaled noise variant), and CKKSrns
(canonical-embedding encode/decode, encrypt/decrypt, add, mult + RNS rescale).
CKKS bootstrapping and modulus-switching-leveled APIs are later milestones.
"""

from .bfv import BFVContext, BFVParams  # noqa: F401
from .bfv_rns import BFVRnsContext  # noqa: F401
from .bgv import BGVContext, BGVParams  # noqa: F401
from .bgv_rns import BGVRnsContext  # noqa: F401
from .ckks import CKKSContext, CKKSParams  # noqa: F401
from .dcrt import DCRTPoly, DCRTParams  # noqa: F401
