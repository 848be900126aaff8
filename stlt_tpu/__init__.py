"""stlt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for compositional
action recognition from spatio-temporal layouts.

Re-designed from scratch with the capabilities of the reference PyTorch
codebase for "Revisiting spatio-temporal layouts for compositional action
recognition" (BMVC 2021): STLT / LCF / CAF / CACNF model families,
Something-Something/Something-Else and Action Genome/Charades datasets,
training + inference CLIs — plus TPU-first additions the reference lacks:
SPMD data/tensor parallelism over a device mesh, bf16 compute, fused Pallas
attention kernels, and Orbax checkpointing with resume.
"""

__version__ = "0.1.0"
