"""Data layer: tokenizers, relation datasets, instruction templates,
collators emitting fixed-shape arrays, task mixing, resumable sampling.

Equivalent of procyon/data (SURVEY.md §2.1 L2) with one structural change:
collators emit static-shape numpy batches (padded/bucketed) instead of the
reference's ragged list-of-lists contract (§2.2), so every batch jits.
"""
