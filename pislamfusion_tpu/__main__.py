"""`python -m pislamfusion_tpu` — the pislamfusion binary (src/main.cpp)."""
import sys

from .app import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
