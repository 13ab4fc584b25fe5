"""InputState / TerminalInput (the WindowProc analog)."""

from multi_adapter_particles_tpu.runtime.input import InputState, TerminalInput


def make():
    ti = TerminalInput(stream=None)
    ti._fd = None  # force no-tty path; feed() injects keys
    return ti


def test_space_toggles_draw_edge():
    ti = make()
    st = ti.feed(" ")
    assert st.toggle_draw
    st = ti.feed("x")
    assert not st.toggle_draw  # edge cleared each frame


def test_escape_and_q_quit():
    assert make().feed("\x1b").quit
    assert make().feed("q").quit
    assert make().feed("\x03").quit
    assert not make().feed("a").quit


def test_arrow_escape_sequences():
    st = make().feed("\x1b[A\x1b[D")
    assert st.pressed == ["up", "left"]
    assert not st.quit  # arrows are not a bare ESC


def test_wasd_keys():
    st = make().feed("wasd")
    assert st.pressed == ["w", "a", "s", "d"]


def test_no_tty_is_noop():
    import io

    ti = TerminalInput(stream=io.StringIO())
    with ti:
        st = ti.poll()
    assert not st.quit and not st.pressed


def test_camera_integration():
    from multi_adapter_particles_tpu.render.camera import Camera

    cam = Camera()
    y0 = cam.yaw
    st = make().feed("\x1b[D")
    for k in st.pressed:
        cam.key_down(k)
    cam.update(0.1)
    for k in st.pressed:
        cam.key_up(k)
    assert cam.yaw != y0  # left arrow turned the camera
