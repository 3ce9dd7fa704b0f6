import sys

from tpulbm.cli import main

sys.exit(main())
