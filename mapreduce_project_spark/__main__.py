import sys

from mapreduce_project_spark.cli import main

sys.exit(main())
