import sys

from gear5_spark.cli import main

sys.exit(main())
