"""Split driver-contract package (round 4): the round-3
20.5k-line __ray_entry__.py monolith, re-exported through a
thin __ray_entry__.py.  Modules: _helpers (index cache, entry
flagship, shared SQL CTE builders), _gates_N (the _q_* query
callables, original order preserved), registry (queries()),
_oracle_N + oracle (oracle_sql()).  Gate output is byte-
identical to the monolith (verified at split time)."""
