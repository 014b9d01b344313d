"""Scan operators: the bit-parallel automata.

bitword  -- scalar (python int) per-byte step functions; the executable
            spec used by unit tests.
scan     -- production JAX implementation: windowed-parallel shift-or
            over tiled byte streams (works on CPU and TPU; on TPU the
            hot loop also has a Pallas kernel in kernels.py).
"""
