"""`python -m better_cdc_spark` — the cdc-handler process (see app.py)."""

import sys

from better_cdc_spark.app import main

sys.exit(main())
