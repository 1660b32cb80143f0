#!/usr/bin/env python
"""spark-submit entry point for the CDC pipeline.

    spark-submit --master local[32] --py-files engine.zip \
        run_pipeline.py --config pipeline.json [--timeout 600]

(`scripts/package.py` builds engine.zip). Inside spark-submit a
SparkSession already exists; `gear5_spark.session.get_spark` reuses it via
getOrCreate, so the same config applies in both launch modes.
"""

from __future__ import annotations

import sys

from gear5_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(["read", *sys.argv[1:]]))
