"""pymoo stand-in: only the hypervolume indicator surface the reference
imports (main.py:33)."""
