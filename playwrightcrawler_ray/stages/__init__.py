"""Dataset stages: callable classes for ``map_batches`` actor pools.

Each stage does its expensive setup (corpus handle, compiled regex
tables, actor handles) once in ``__init__`` and processes Arrow batches
in ``__call__`` — the actor-pool pattern for stateful stages.
"""
