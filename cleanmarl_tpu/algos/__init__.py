"""Algorithm implementations, one module per algorithm (preserving the
reference's single-file-per-algorithm pedagogy, SURVEY.md §2.3) on top of
the shared envs/core/buffers packages. Recurrent (GRU) policies and
vectorized envs are config flags rather than separate files: every
algorithm here is natively vectorized and jitted end-to-end, and
``recurrent=True`` swaps the feed-forward trunk for a scanned GRU core —
covering the reference's ``_lstm``/``_multienvs``/``_jax`` variant axes
(SURVEY.md §0) in one implementation each.
"""
