from fourdgs.gui.viewer import LiveViewer, GaussianSnapshot  # noqa: F401
