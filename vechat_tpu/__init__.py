"""vechat_tpu — TPU-native haplotype-aware long-read error correction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HaploKit/vechat
(reference: Python driver + racon C++ fork + modified spoa POA library).

Layers (outside-in):
  cli/       vechat- and racon-compatible command line surfaces
  pipeline/  two-round correction driver, windowing, overlapper
  parallel/  device-mesh sharding, multi-host orchestration
  ops/       POA variation-graph engine + alignment DP (JAX + Pallas kernels)
  io/        FASTA/FASTQ/PAF readers and writers
  utils/     logging, timers, config
"""

__version__ = "0.1.0"
