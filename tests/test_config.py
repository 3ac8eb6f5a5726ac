from ms_slam_tpu.utils.config import Settings


def test_parse_kitti_yaml():
    st = Settings("configs/KITTI00-02.yaml")
    calib = st.calib()
    assert abs(calib.params[0] - 718.856) < 1e-6
    assert calib.bf == 386.1448
    assert calib.width == 1241 and calib.height == 376
    # ThDepth in meters = bf * 35 / fx
    assert abs(calib.th_depth - 386.1448 * 35 / 718.856) < 1e-3
    orb = st.orb()
    assert orb.n_features == 2048  # 2000 rounded up to x128
    assert orb.n_levels == 8
    cfg = st.system_config()
    assert cfg.sparsify and cfg.sparsify_n == 100
    assert cfg.sparsify_lambda == 500 and cfg.nonlocal_kf == 30
    assert cfg.sparsify_window == 30
    assert cfg.loop_closing


def test_parse_euroc_yaml():
    st = Settings("configs/EuRoC.yaml")
    cfg = st.system_config()
    assert cfg.sparsify_n == 75 and cfg.nonlocal_kf == 15
    assert len(st.flat["K_l"]) == 9
