"""Basic utility modes (help/selftest style)."""

from __future__ import annotations

import sys

from ..config import Field, Mode, register


@register("mode", "noop", help="do nothing (dispatch smoke test)")
class Noop(Mode):
    msg = Field(str, default="noop ok", help="message to print")

    def main(self) -> None:
        sys.stdout.write(self.msg + "\n")
