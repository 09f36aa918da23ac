"""`python -m pbdagcon_tpu` == the `tpu-dagcon` CLI."""

from pbdagcon_tpu.cli import main

raise SystemExit(main())
