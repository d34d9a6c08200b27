"""Ray-Data-native adaptive document-extraction engine.

A from-scratch rebuild of the capabilities of
``GustavoZiel/adaptive-PDF-extractor`` (reference read-only at
``/root/reference``) on top of ``ray.data.Dataset`` streaming pipelines:

- per-row semantics (text normalization, regex rule execution with the
  empty-capture null sentinel, weighted rule ordering) are byte-identical
  to the reference (``src/data.py:51-95``, ``src/rule.py:71-99``,
  ``src/cache.py:207-289``);
- the architecture is a distributed dataflow, not a port: the reference's
  sequential per-document LLM feedback loop becomes
  ``groupby(fingerprint) -> deterministic rule fit -> broadcast apply``
  waves over Arrow batches.

Subpackages:
  functions  pure-Python/Arrow core semantics (no Ray dependency)
  sources    readers + synthetic corpus generation (HTML / PDF builders)
  stages     map_batches stages (parse, normalize, fingerprint, apply, ...)
  state      rule store (persisted Parquet), checkpoint manifests
  pipelines  end-to-end pipelines wiring stages together
"""

__version__ = "0.1.0"
