"""Pure core semantics: no Ray imports here.

Everything in this package is a plain function over Python scalars or
pyarrow arrays, so it can be unit-tested without a Ray session and reused
by both the pipeline stages and the pure-Python test oracle.
"""
