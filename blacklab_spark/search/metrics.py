"""Request + process metrics with a Prometheus text exposition — the
analogue of the reference's instrumentation module
(instrumentation/.../PrometheusMetricsProvider.java: micrometer registry
+ JVM/system meters + a /metrics scrape endpoint;
RequestInstrumentationProvider tags requests with corpus + operation).

Pure stdlib. The driver-process gauges here (cpu, rss, fds, gc) mirror
the reference's JvmMemoryMetrics/ProcessorMetrics binders for THIS
process; executor-side JVM metrics in a real deployment come from
Spark's own metrics system (spark.metrics.conf → JmxSink/PrometheusServlet),
which exists independently of this module — we expose the engine-level
meters Spark can't know about: per-(corpus, operation) request counts
and latencies, result-cache hits, and index size gauges.
"""

from __future__ import annotations

import os
import threading
import time


class MetricsRegistry:
    """Thread-safe counters + timer summaries, rendered in Prometheus
    text format 0.0.4 (the format PrometheusMeterRegistry.scrape()
    emits). Timers follow micrometer's summary convention:
    _count / _sum / _max series."""

    def __init__(self):
        self._lock = threading.Lock()
        # (corpus, operation, status) -> count
        self._requests: dict[tuple[str, str, str], int] = {}
        # (corpus, operation) -> [count, sum_seconds, max_seconds]
        self._timers: dict[tuple[str, str], list[float]] = {}
        self._gauges: dict[str, tuple[str, object]] = {}  # name -> (help, fn)
        self._started = time.time()

    def record_request(self, corpus: str, operation: str, status: int,
                       seconds: float) -> None:
        with self._lock:
            k = (corpus, operation, str(status))
            self._requests[k] = self._requests.get(k, 0) + 1
            t = self._timers.setdefault((corpus, operation), [0, 0.0, 0.0])
            t[0] += 1
            t[1] += seconds
            t[2] = max(t[2], seconds)

    def register_gauge(self, name: str, help_text: str, fn) -> None:
        """``fn() -> float | dict[labelstr, float]`` evaluated at scrape
        time (micrometer gauge semantics)."""
        with self._lock:
            self._gauges[name] = (help_text, fn)

    # ---- rendering ------------------------------------------------------
    @staticmethod
    def _esc(v: str) -> str:
        return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")

    def scrape(self) -> str:
        out = []
        with self._lock:
            reqs = dict(self._requests)
            timers = {k: list(v) for k, v in self._timers.items()}
            gauges = dict(self._gauges)
            started = self._started
        out.append("# HELP blacklab_requests_total Requests served, by corpus/operation/status.")
        out.append("# TYPE blacklab_requests_total counter")
        for (c, op, st), n in sorted(reqs.items()):
            out.append(
                f'blacklab_requests_total{{corpus="{self._esc(c)}",'
                f'operation="{self._esc(op)}",status="{st}"}} {n}'
            )
        out.append("# HELP blacklab_request_seconds Request latency summary.")
        out.append("# TYPE blacklab_request_seconds summary")
        for (c, op), (n, s, mx) in sorted(timers.items()):
            lbl = f'corpus="{self._esc(c)}",operation="{self._esc(op)}"'
            out.append(f"blacklab_request_seconds_count{{{lbl}}} {int(n)}")
            out.append(f"blacklab_request_seconds_sum{{{lbl}}} {s:.6f}")
            out.append(f"blacklab_request_seconds_max{{{lbl}}} {mx:.6f}")
        out.append("# HELP process_uptime_seconds Seconds since registry creation.")
        out.append("# TYPE process_uptime_seconds gauge")
        out.append(f"process_uptime_seconds {time.time() - started:.3f}")
        out.extend(self._process_metrics())
        for name, (help_text, fn) in sorted(gauges.items()):
            out.append(f"# HELP {name} {help_text}")
            out.append(f"# TYPE {name} gauge")
            try:
                val = fn()
            except Exception:
                continue
            if isinstance(val, dict):
                for lbl, v in sorted(val.items()):
                    out.append(f"{name}{{{lbl}}} {v}")
            else:
                out.append(f"{name} {val}")
        return "\n".join(out) + "\n"

    @staticmethod
    def _process_metrics() -> list[str]:
        """Driver-process health (ProcessorMetrics / JvmMemoryMetrics
        analogue: cpu seconds, resident memory, open fds, gc counts)."""
        out = []
        t = os.times()
        out.append("# HELP process_cpu_seconds_total Total user+system CPU time.")
        out.append("# TYPE process_cpu_seconds_total counter")
        out.append(f"process_cpu_seconds_total {t.user + t.system:.3f}")
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        kb = float(line.split()[1])
                        out.append("# HELP process_resident_memory_bytes Resident set size.")
                        out.append("# TYPE process_resident_memory_bytes gauge")
                        out.append(f"process_resident_memory_bytes {kb * 1024:.0f}")
                        break
        except OSError:
            pass
        try:
            nfds = len(os.listdir("/proc/self/fd"))
            out.append("# HELP process_open_fds Open file descriptors.")
            out.append("# TYPE process_open_fds gauge")
            out.append(f"process_open_fds {nfds}")
        except OSError:
            pass
        import gc

        counts = gc.get_count()
        out.append("# HELP python_gc_objects_collectable Current collectable objects per generation.")
        out.append("# TYPE python_gc_objects_collectable gauge")
        for gen, n in enumerate(counts):
            out.append(f'python_gc_objects_collectable{{generation="{gen}"}} {n}')
        return out


def bind_corpus_gauges(registry: MetricsRegistry, corpora: dict) -> None:
    """Index-size and cache gauges per mounted corpus — the engine-level
    meters the reference registers next to the system ones (index
    tokenCount in ResultIndexStatus, BlsCache sizes in cache-info)."""

    # snapshot (list(...)) at scrape time: IndexManager mutates the live
    # registry dict concurrently (create/delete corpus), and iterating
    # it directly could raise "dictionary changed size during iteration"
    def n_docs():
        return {
            f'corpus="{MetricsRegistry._esc(n)}"': c.meta.get("n_docs", 0)
            for n, c in list(corpora.items())
        }

    def n_tokens():
        return {
            f'corpus="{MetricsRegistry._esc(n)}"': c.meta.get("total_tokens", 0)
            for n, c in list(corpora.items())
        }

    def cache_entries():
        out = {}
        for n, c in list(corpora.items()):
            info = c.cache_info()
            lbl = f'corpus="{MetricsRegistry._esc(n)}"'
            out[f'{lbl},kind="entries"'] = info.get("entries", 0)
            out[f'{lbl},kind="hits"'] = info.get("hits", 0)
            out[f'{lbl},kind="misses"'] = info.get("misses", 0)
        return out

    registry.register_gauge(
        "blacklab_index_documents", "Live documents per mounted corpus.", n_docs
    )
    registry.register_gauge(
        "blacklab_index_tokens", "Total tokens per mounted corpus.", n_tokens
    )
    registry.register_gauge(
        "blacklab_cache_searches", "Cached search results per corpus.",
        cache_entries,
    )
