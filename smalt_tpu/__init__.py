"""smalt_tpu — a TPU-native DNA read-alignment engine.

A from-scratch re-design of the SMALT hashing read aligner
(reference: rcallahan/smalt v0.7.6) for TPU hardware: the sampled
k-mer index lives as flat device arrays, seed lookup and candidate
collation are vectorized JAX gather/sort programs, and the banded
Smith-Waterman extension runs as batched Pallas kernels. Host-side
Python/NumPy handles the irregular tails (FASTQ IO, traceback walk,
SAM text).

Layer map (≈ reference layers, see SURVEY.md):
  seq/      sequence codec + FASTA/FASTQ IO + reference set   (sequence.c)
  index/    sampled k-mer index build + lookup                (hashidx.c)
  seed/     per-read k-mer hit collection                     (hashhit.c)
  segment/  seeds -> constant-shift segments -> candidates    (segment.c)
  align/    banded affine SW kernels + diff strings           (alignment.c, swsimd.c, diffstr.c)
  results/  result sets, mapq, pairing, insert sizes          (results.c, resultpairs.c, insert.c)
  report/   SAM/CIGAR/SSAHA/GFF2 output                       (report.c)
  map/      per-read mapping engine + batch pipeline          (rmap.c, smalt.c)
  parallel/ device mesh, sharded index, collectives           (threads.c analogue)
"""

__version__ = "0.1.0"

import os as _os

# Persist compiled XLA programs across processes: remote-tunnel TPU
# compiles of the bigger Pallas shapes take minutes, and every CLI run
# is a fresh process.  Harmless on CPU; override with your own value.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/smalt_tpu_xla"))
