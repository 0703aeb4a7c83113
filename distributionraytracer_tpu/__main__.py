from distributionraytracer_tpu.cli import main

main()
