"""blazr_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference engine (ml-rust/blazr): weight-only INT4 (AWQ/GPTQ) and GGUF
K-quant dequantization as fused Pallas kernels feeding bf16 MXU matmuls,
paged KV cache with prefix caching, continuous batching, an
OpenAI-compatible SSE server, and a model zoo covering Llama/Mistral/Qwen
GQA attention, Mamba2 selective scan, DeepSeek MLA latent-KV attention,
MoE expert routing and hybrid mixes — scaled over TPU meshes with
pjit/shard_map.

Layer map (TPU-native analogue of reference src/lib.rs layer diagram):

    L6  cli/        run/generate/chat/serve/bench/info/list
    L5  server/     aiohttp: OpenAI+Anthropic APIs, SSE, metrics, SLO
    L4  engine/     Executor, BatchEngine, schedulers, sampling, grammar
    L3  formats/ + models/ + tokenizer/ + config/
    L2  quant/ + attention/ + kvcache/   (Pallas kernels + XLA compute)
    L1  parallel/   mesh, shardings, collectives (replaces NCCL/nexar)
"""

__version__ = "0.1.0"
