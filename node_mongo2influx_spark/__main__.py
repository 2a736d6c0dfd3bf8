from node_mongo2influx_spark.cli import main

raise SystemExit(main())
