from swat_mapreduce_spark.cli import main

raise SystemExit(main())
