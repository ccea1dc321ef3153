"""PKE module: RNS/DCRT lattice arithmetic and the BFV/BGV/CKKS families.

The counterpart of the reference's `src/pke` (SURVEY.md §2.3): CryptoContext
front-end with security-driven parameter generation, RNS machinery over DCRT
polynomials, scheme implementations (exact-host, pure-RNS, and device tiers),
hybrid key switching with hoisted rotations, advanced SHE, PRE/threshold,
noise flooding, and CKKS bootstrapping in every reference configuration
(dense, BSGS+Paterson-Stockmeyer, FFT-factored levelBudget, sparse packing,
iterative) — host and on-device.
"""

from .bfv import BFVContext, BFVParams  # noqa: F401
from .bfv_rns import BFVRnsContext  # noqa: F401
from .bgv import BGVContext, BGVParams  # noqa: F401
from .bgv_rns import BGVRnsContext  # noqa: F401
from .ckks import CKKSContext, CKKSParams  # noqa: F401
from .context import SecurityError, gen_crypto_context  # noqa: F401
from .dcrt import DCRTPoly, DCRTParams  # noqa: F401
