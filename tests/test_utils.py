"""Utility coverage: meters, LR schedules, colorize, ports, dirs."""

import os

import numpy as np
import pytest

from semseg_tpu.utils import (
    AverageMeter,
    check_makedirs,
    colorize,
    poly_learning_rate,
    step_learning_rate,
)
from semseg_tpu.utils.misc import check_mkdir, find_free_port


def test_average_meter_tracks_weighted_average():
    m = AverageMeter()
    m.update(2.0, n=3)
    m.update(4.0, n=1)
    assert m.val == 4.0
    assert m.count == 4
    assert m.avg == pytest.approx((2.0 * 3 + 4.0) / 4)
    m.reset()
    assert m.count == 0 and m.avg == 0


def test_average_meter_accumulates_arrays():
    m = AverageMeter()
    m.update(np.array([1, 2]))
    m.update(np.array([3, 4]))
    np.testing.assert_array_equal(m.sum, [4, 6])


def test_poly_learning_rate_reference_values():
    assert poly_learning_rate(0.01, 0, 100) == pytest.approx(0.01)
    assert poly_learning_rate(0.01, 50, 100, power=0.9) == pytest.approx(
        0.01 * 0.5 ** 0.9
    )
    assert poly_learning_rate(0.01, 100, 100) == pytest.approx(0.0)


def test_step_learning_rate():
    assert step_learning_rate(0.1, epoch=0, step_epoch=30) == pytest.approx(0.1)
    assert step_learning_rate(0.1, epoch=30, step_epoch=30) == pytest.approx(0.01)
    assert step_learning_rate(0.1, epoch=65, step_epoch=30) == pytest.approx(0.001)


def test_colorize_palette_png(tmp_path):
    gray = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    palette = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90]], np.uint8)
    img = colorize(gray, palette)
    assert img.mode == "P"
    rgb = np.asarray(img.convert("RGB"))
    np.testing.assert_array_equal(rgb[0, 0], [10, 20, 30])
    np.testing.assert_array_equal(rgb[0, 1], [40, 50, 60])
    np.testing.assert_array_equal(rgb[1, 0], [70, 80, 90])
    # survives PNG round trip
    p = tmp_path / "c.png"
    img.save(str(p))
    import cv2

    back = cv2.imread(str(p))
    np.testing.assert_array_equal(back[0, 0], [30, 20, 10])  # BGR


def test_find_free_port_is_bindable():
    import socket

    port = find_free_port()
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", port))


def test_dir_helpers(tmp_path):
    one = tmp_path / "a"
    check_mkdir(str(one))
    assert one.is_dir()
    deep = tmp_path / "b" / "c" / "d"
    check_makedirs(str(deep))
    assert deep.is_dir()
    check_makedirs(str(deep))  # idempotent
