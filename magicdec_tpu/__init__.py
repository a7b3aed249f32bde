"""magicdec_tpu — TPU-native long-context speculative decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MagicDec
(praisechan/MagicDec, arXiv:2408.11049): speculative decoding for
Llama/Qwen/Yi/Mistral at large batch x long context, where the draft model
attends to a fixed small KV budget (StreamingLLM sink+window or SnapKV top-k)
so that speedup *grows* with batch size.

Layer map (TPU-native analog of reference SURVEY.md §1):
  ops/        rope, norms, dense attention oracle, Pallas kernels (L0)
  models/     functional Llama-family decoder, config table          (L1)
  engine/     Engine: paged-equivalent KV state + jitted step fns    (L2)
  parallel/   Mesh / NamedSharding / distributed argmax (GSPMD)      (L3)
  benchmarks/ CLI drivers (the reference's tests/*)                  (L4)
  data/       PG19/LongBench/Ruler converters                        (L5)
  checkpoint/ HF safetensors -> framework params                     (L6)
"""

__version__ = "0.1.0"
