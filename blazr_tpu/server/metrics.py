"""Prometheus metrics.

TPU-native port of the reference metric set (src/server/metrics.rs:15-36):
request counts/durations, token counters, TTFT/ITL/tok-s histograms,
model-lifecycle counters, and the autoscaling signals (queue depth, active
decode slots, token-budget utilization — explicitly HPA/KEDA signals in
the reference :72-83), KV block utilization and prefix-cache hit rates.
"""

from __future__ import annotations

from prometheus_client import (
    CollectorRegistry,
    Counter,
    Gauge,
    Histogram,
    generate_latest,
)

PREFIX = "blazr_tpu"


class Metrics:
    def __init__(self) -> None:
        self.registry = CollectorRegistry()
        c = lambda name, doc, **kw: Counter(f"{PREFIX}_{name}", doc,
                                            registry=self.registry, **kw)
        g = lambda name, doc: Gauge(f"{PREFIX}_{name}", doc, registry=self.registry)
        h = lambda name, doc, buckets: Histogram(
            f"{PREFIX}_{name}", doc, registry=self.registry, buckets=buckets)

        lat_buckets = (0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5,
                       1.0, 2.5, 5.0, 10.0, 30.0, 60.0)
        self.requests_total = c("requests_total", "Total requests",
                                labelnames=("endpoint", "status"))
        self.requests_active = g("requests_active", "In-flight requests")
        self.request_duration = h("request_duration_seconds",
                                  "End-to-end request latency", lat_buckets)
        self.tokens_prompted = c("tokens_prompted_total", "Prompt tokens")
        self.tokens_generated = c("tokens_generated_total", "Generated tokens")
        self.ttft = h("ttft_seconds", "Time to first token", lat_buckets)
        self.itl = h("itl_seconds", "Inter-token latency",
                     (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0))
        self.tokens_per_second = h("tokens_per_second", "Decode throughput",
                                   (1, 5, 10, 25, 50, 100, 200, 400, 800))
        self.models_loaded = g("models_loaded", "Loaded model count")
        self.model_loads = c("model_loads_total", "Model load events")
        self.model_evictions = c("model_evictions_total", "Model evictions")
        # Autoscaling signals (reference metrics.rs:72-83)
        self.queue_depth = g("queue_depth", "Waiting sequences (HPA signal)")
        self.active_decode_slots = g("active_decode_slots",
                                     "Running sequences (HPA signal)")
        self.token_budget_utilization = g(
            "token_budget_utilization",
            "In-flight token budget fraction (KEDA signal)")
        self.kv_block_utilization = g("kv_block_utilization",
                                      "KV cache block pool utilization")
        self.prefix_cache_hits = c("prefix_cache_hits_total", "Prefix cache hits")
        self.prefix_cache_misses = c("prefix_cache_misses_total",
                                     "Prefix cache misses")
        self.slo_violations = c("slo_violations_total", "SLO violations",
                                labelnames=("metric",))
        self.hbm_used_bytes = g("hbm_used_bytes", "Device memory in use")
        # Speculative-decode + horizon telemetry (reference logs acceptance
        # stats, speculative.rs:131-136; here exported as gauges refreshed
        # from the engine's counters at render time).
        self.spec_drafted = g("spec_drafted_total",
                              "Speculative tokens drafted")
        self.spec_accepted = g("spec_accepted_total",
                               "Speculative tokens accepted")
        self.spec_acceptance_rate = g("spec_acceptance_rate",
                                      "Draft acceptance fraction")
        self.spec_depth = g("spec_depth",
                            "Current (adaptive) speculation depth")
        self.horizon_steps_per_dispatch = g(
            "horizon_steps_per_dispatch",
            "Mean decode steps fused per horizon dispatch")
        self.moe_tokens_dropped = g(
            "moe_ep_tokens_dropped_total",
            "MoE tokens dropped at expert capacity (EP dispatch)")

    def render(self) -> bytes:
        return generate_latest(self.registry)
