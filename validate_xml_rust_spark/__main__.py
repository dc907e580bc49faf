from validate_xml_rust_spark.cli import main

raise SystemExit(main())
