"""tfhe_tpu — a TPU-native TFHE/FHEW (BinFHE) bootstrapping framework.

Built from scratch in JAX/XLA/Pallas with the capability set of
eric070021/TFHE-GPU (OpenFHE 1.0.4 BinFHE + CUDA batched bootstrapping):
CGGI/GINX and DM blind rotation, batched EvalBinGate / EvalFunc / EvalFloor /
EvalSign / EvalDecomp / CiphertextMulMatrix, LWE key & modulus switching, and
the TOY..STD256Q parameter sets — implemented with exact modular-arithmetic
kernels (negacyclic NTT) instead of the reference's approximate FFT, so device
results match the OpenFHE CPU path bit-for-bit.

Layers (bottom-up; see SURVEY.md for the reference layer map):
- utils/  : number theory, std-lattice tables, RNG, serialization
- ref/    : exact host oracle (numpy) — the bit-exactness reference
- ops/    : JAX/XLA/Pallas device kernels (NTT, blind rotation, key switch)
- parallel/: device meshes and batch sharding (pjit/shard_map)
- lwe/scheme/context: the BinFHE scheme and the user-facing API
"""

from .context import BinFHEContext
from .params import Gate, Method, ParamSet

__all__ = ["BinFHEContext", "Gate", "Method", "ParamSet"]
__version__ = "0.1.0"
