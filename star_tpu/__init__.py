"""star_tpu: TPU-native spliced RNA-seq aligner with STAR's capability surface.

Architecture (TPU-first, not a port):
  * genome/: index build + load; genome, suffix array and prefix index are
    immutable arrays destined for device HBM (sharded across a mesh for
    mammal-scale genomes).
  * align/: host reference implementation of the per-read pipeline (exact
    output semantics; drives golden tests and long-tail features).
  * ops/: batched JAX/Pallas device kernels (MMP seed search over thousands of
    probes per dispatch, extension/stitch DP).
  * parallel/: jax.sharding mesh layout, index sharding, collective merges.
  * io/: FASTQ in, SAM/BAM/SJ out, logs/stats.
"""

__version__ = "0.1.0"
