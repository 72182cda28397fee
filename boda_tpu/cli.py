"""Mode dispatch: one entry point, many subcommands.

Parity target: ref src/boda.cc (boda_main_arg_proc :57) — argv → lexp →
registry-instantiated mode object → ``main()``, plus generated help and XML
command files. Run as ``python -m boda_tpu <mode> --k=v ...``.
"""

from __future__ import annotations

import sys

from . import modes_all  # noqa: F401  (imports register all modes)
from .config import (ConfigError, default_cfg_init, help_str, instantiate,
                     run_mode)
from .utils.lexp import LexpError, lexp_from_argv, parse_lexp_xml_file
from .utils.timers import timer_log_finalize


def run_mode_lexp(l) -> None:
    mode = instantiate("mode", l, check_unused_keys=True)
    run_mode(mode)


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    # honor a user-set JAX_PLATFORMS even under environments whose
    # sitecustomize force-registers an accelerator and pins jax_platforms in
    # config (the env var alone is silently ignored there); must run before
    # first jax backend use. "axon" entries are the sitecustomize's own
    # baseline value, not user intent — never re-apply those (doing so would
    # clobber an embedding caller's explicit jax.config platform choice).
    import os
    env_plats = os.environ.get("JAX_PLATFORMS", "")
    if env_plats and "axon" not in env_plats.split(","):
        import jax
        jax.config.update("jax_platforms", env_plats)
    default_cfg_init()
    try:
        if not argv or argv[0] in ("help", "--help", "-h"):
            sys.stdout.write(help_str("mode"))
            if len(argv) > 1:
                sys.stdout.write("\n" + help_str("mode", argv[1]))
            return 0
        if argv[0] == "xml" and len(argv) >= 2:
            # XML command file: run the mode defined by the root (or sub) element
            fn = argv[1]
            elem_path = argv[2] if len(argv) > 2 else ""
            run_mode_lexp(parse_lexp_xml_file(fn, elem_path))
            return 0
        if len(argv) >= 2 and argv[1] in ("--help", "-h"):
            sys.stdout.write(help_str("mode", argv[0]))
            return 0
        run_mode_lexp(lexp_from_argv(argv))
        return 0
    except (ConfigError, LexpError, ValueError, RuntimeError) as e:
        # top-level exception wrapper (ref boda.cc:115 boda_main_wrap)
        sys.stderr.write(f"error: {e}\n")
        return 1
    except SystemExit as e:
        return int(e.code or 0)
    finally:
        timer_log_finalize()


if __name__ == "__main__":
    sys.exit(main())
