from svt_av1_tpu.app.cli import main

raise SystemExit(main())
