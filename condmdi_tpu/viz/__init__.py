from condmdi_tpu.viz.plot import plot_3d_motion, save_stick_figure_video
