"""`python -m gs2d_tpu.fit` entry point."""

from gs2d_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
