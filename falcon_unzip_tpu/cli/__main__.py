"""python -m falcon_unzip_tpu.cli — same entry as the console script."""
import sys

from . import main

if __name__ == "__main__":
    sys.exit(main())
