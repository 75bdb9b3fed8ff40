#!/bin/bash
# Export LW-DETR-medium as a serialized StableHLO deployment artifact
python main.py --preset medium --output_dir output/lwdetr_medium_export \
    export_model --shape 640 640
