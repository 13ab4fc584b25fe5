"""`python -m multi_adapter_particles_tpu` — the WinMain entry point analog."""

from multi_adapter_particles_tpu.app import main

raise SystemExit(main())
