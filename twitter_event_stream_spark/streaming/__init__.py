"""Structured Streaming layer — the reference's native domain re-expressed.

``replay``    — deterministic file-replay source fixture (FIXTURES.md)
``pipelines`` — the userstream-bridge dataflow (ingest → decode → dispatch →
                subscribe-filter → reshape → dedup → fan-out) and the
                stateful operators (watermarked windows, keyed state)
"""
