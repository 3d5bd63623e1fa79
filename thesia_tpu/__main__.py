"""`python -m thesia_tpu` launches the engine service + viewer."""

from .engine.service import main

main()
