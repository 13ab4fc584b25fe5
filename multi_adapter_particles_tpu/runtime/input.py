"""Keyboard input handling — the WindowProc / InputState analog.

The reference translates Win32 messages into an `InputState` consumed by
the camera and app (`WindowProc.cpp:37-152`): ESC quits, SPACE toggles
drawing, arrows/WASD fly the camera (forwarded but effectively unused —
`Render.cpp:773` updates with dt=0). Headless, the same contract reads raw
terminal keys without blocking the frame loop.

`InputState` carries one frame's worth of edge/level state; `TerminalInput`
is the message pump: put the tty in cbreak mode, poll with select, decode
escape sequences for arrows. Non-tty (pipes, CI) degrades to a no-op.
"""

from __future__ import annotations

import os
import select
import sys
from dataclasses import dataclass, field
from typing import List, Optional, Set


@dataclass
class InputState:
    """Per-frame input snapshot (`WindowProc.h:39-72` analog)."""

    quit: bool = False
    toggle_draw: bool = False          # SPACE edge (Main-Particles.cpp:86-88)
    keys_down: Set[str] = field(default_factory=set)   # held (level) keys
    pressed: List[str] = field(default_factory=list)   # this frame's edges

    def clear_edges(self):
        self.toggle_draw = False
        self.pressed = []


_ESCAPE_SEQS = {
    "[A": "up", "[B": "down", "[C": "right", "[D": "left",
    "OA": "up", "OB": "down", "OC": "right", "OD": "left",
}


class TerminalInput:
    """cbreak-mode key reader; a no-op when stdin is not a tty."""

    def __init__(self, stream=None):
        self.stream = stream if stream is not None else sys.stdin
        self._fd: Optional[int] = None
        self._saved = None
        self.state = InputState()

    # -- lifecycle -----------------------------------------------------------
    def __enter__(self):
        try:
            if self.stream.isatty():
                import termios
                import tty

                self._fd = self.stream.fileno()
                self._saved = termios.tcgetattr(self._fd)
                tty.setcbreak(self._fd)
        except (OSError, ValueError, ImportError):
            self._fd = None
        return self

    def __exit__(self, *exc):
        if self._fd is not None and self._saved is not None:
            import termios

            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._saved)
        return False

    # -- polling -------------------------------------------------------------
    def _read_available(self) -> str:
        if self._fd is None:
            return ""
        chunks = []
        while select.select([self._fd], [], [], 0)[0]:
            try:
                chunks.append(os.read(self._fd, 64).decode(errors="ignore"))
            except OSError:
                break
        return "".join(chunks)

    def poll(self) -> InputState:
        """Drain pending keys into a fresh edge state (call once per frame)."""
        self.state.clear_edges()
        buf = self._read_available()
        i = 0
        while i < len(buf):
            ch = buf[i]
            if ch == "\x1b":
                key = _ESCAPE_SEQS.get(buf[i + 1 : i + 3])
                if key:
                    self.state.pressed.append(key)
                    i += 3
                    continue
                self.state.quit = True  # bare ESC (WindowProc.cpp:66-69)
                i += 1
                continue
            if ch == " ":
                self.state.toggle_draw = True
            elif ch in ("q", "\x03"):  # q / ctrl-c
                self.state.quit = True
            elif ch.lower() in "wasdcrvefl" or ch in "[]-=123456":
                # fly keys, adapter-cycle keys, and the control-panel keys
                # (size/intensity/counts/toggles — see runtime/controls.py)
                self.state.pressed.append(ch.lower())
            i += 1
        return self.state

    def feed(self, text: str) -> InputState:
        """Test hook: process keys as if typed."""
        self.state.clear_edges()
        saved_read = self._read_available
        try:
            self._read_available = lambda: text  # type: ignore
            return self.poll()
        finally:
            self._read_available = saved_read  # type: ignore
