"""Regenerate docs/MODES.md from the mode registry (run after adding modes)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import boda_tpu.modes_all  # noqa: F401
    from boda_tpu.config import _REGISTRY, Field
    reg = _REGISTRY["mode"]["classes"]
    out = ["# Mode census (auto-generated from the registry)", "",
           "Run `python -m boda_tpu <mode> --help` for per-field docs.", ""]
    for name in sorted(reg):
        cls = reg[name]
        fields, seen = [], set()
        for klass in reversed(cls.__mro__):  # base-class fields first
            for k, v in vars(klass).items():
                if isinstance(v, Field) and k != "boda_output_dir" \
                        and k not in seen:
                    seen.add(k)
                    fields.append(k)
        out.append(f"- **{name}** — {cls._help}  ")
        out.append(f"  fields: {', '.join(fields)}")
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "MODES.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {len(reg)} modes to docs/MODES.md")


if __name__ == "__main__":
    main()
