import sys

from orderly_spark.cli import main

sys.exit(main())
