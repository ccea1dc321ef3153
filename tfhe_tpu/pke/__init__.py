"""PKE module: RNS/DCRT lattice arithmetic and the BFV scheme family.

The counterpart of the reference's `src/pke` (SURVEY.md §2.3): CryptoContext
front-end, RNS machinery over DCRT polynomials, and scheme implementations.
Round 1 ships the DCRT layer and BFVrns (keygen / encrypt / decrypt / add /
sub / neg / mult / relinearize / mult-depth params); BGV and CKKS follow.
"""

from .bfv import BFVContext, BFVParams  # noqa: F401
from .dcrt import DCRTPoly, DCRTParams  # noqa: F401
