from ppcseq_tpu.cli import main

raise SystemExit(main())
