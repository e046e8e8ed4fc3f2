import sys

from pim_jpeg_decoder_tpu.cli import main

sys.exit(main())
