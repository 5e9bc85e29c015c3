from qpsk_tpu.cli import main

raise SystemExit(main())
