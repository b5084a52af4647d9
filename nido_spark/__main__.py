from nido_spark.cli import main

raise SystemExit(main())
