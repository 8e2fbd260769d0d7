"""Structured Streaming mode.

The reference is a pure streaming system (Flink jobs over Kafka topics);
this package wires the same transformation code (gmall.*, operators.*)
into readStream/writeStream:

- ``sources``  : Kafka / file-drop / memory stream readers for the ODS
                 envelopes.
- ``stateful`` : the per-key stateful operators that need explicit state in
                 streaming (UV first-per-day, first-visit repair, jump-out
                 with event-time timeout) via applyInPandasWithState.
- ``jobs``     : end-to-end streaming jobs (window aggregations with
                 watermarks, log fan-out, changelog upsert sink).

Batch/streaming parity is by construction: the column logic is shared, and
tests assert the streaming output equals the batch output on the same
fixture corpus.
"""
