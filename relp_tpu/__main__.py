from relp_tpu.cli import main

raise SystemExit(main())
