# Parse --name value command-line options into shell variables.
# Minimal reimplementation of the Kaldi-style option parser contract used
# by the recipe scripts: every `--foo_bar value` (or `--foo-bar value`)
# sets `foo_bar=value`, provided the variable was declared beforehand.
while true; do
    case "${1:-}" in
        --*)
            name="${1#--}"
            name="${name//-/_}"
            if eval "[ -z \"\${${name}+x}\" ]"; then
                echo "parse_options.sh: unknown option --${1#--}" >&2
                exit 1
            fi
            eval "${name}=\"\${2}\""
            shift 2
            ;;
        *) break ;;
    esac
done
