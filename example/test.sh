#!/bin/bash
# Run the CLI with a config file (mirrors the reference's example/test.sh).
if [ "$1" = "--config" ] && [ -n "$2" ]; then
    CONFIG_FILE="$2"
else
    echo "Usage: $0 --config <path_to_config_file>"
    exit 1
fi
python ../run_rhe.py --config "$CONFIG_FILE"
