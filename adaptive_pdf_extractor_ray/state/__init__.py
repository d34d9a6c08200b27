"""Explicit cross-stage state: the rule store and checkpoint manifests."""
