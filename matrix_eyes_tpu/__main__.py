import sys

from matrix_eyes_tpu.cli import main

sys.exit(main())
