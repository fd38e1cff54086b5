"""Offline trainer for the model-grade langid tier: a character-trigram
multinomial naive-Bayes over en/es/pt, producing the committed integer
weight table ``data_ingestion_bra_spark/config/langid_nb_weights.json``.

Training corpus: Article 1 of the Universal Declaration of Human Rights
(public domain, UN) in each language plus a handful of original composed
sentences — deliberately tiny but REAL text; a production deployment
re-runs this script over a larger corpus (OSCAR/Wikipedia dumps) and
commits the regenerated table. The model architecture (trained
log-probability weights, integer-scaled, argmax scoring) is exactly what
a fastText-style classifier provides; the weight table's size is the only
knob that changes.

Determinism contract: normalization here MUST match the runtime scoring
expression in ``operators/langid_nb.py`` (lowercase → non-[a-z space] to
space → collapse spaces → trim → char trigrams, multiset counts), and
weights are integers (round(1000 * ln P)) so Spark and the DuckDB oracle
compute bit-identical scores.

Run: ``python tools/train_langid_nb.py`` (rewrites the JSON in place).
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter
from pathlib import Path

CORPUS: dict[str, str] = {
    "en": (
        "All human beings are born free and equal in dignity and rights. "
        "They are endowed with reason and conscience and should act towards "
        "one another in a spirit of brotherhood. "
        "The quick brown fox jumps over the lazy dog near the river bank. "
        "Data pipelines read tables, filter rows, and write the results to "
        "partitioned storage every day. "
        "This is a simple sentence with common English words that people "
        "use when they talk about work and life. "
        "In the morning the streets of the town fill with people walking to "
        "their offices and shops, and by evening the same streets carry them "
        "home again under the yellow light of the lamps. "
        "She opened the window and looked out over the garden, where the "
        "first leaves of autumn were already falling onto the wet grass. "
        "The report explains how the system collects measurements from each "
        "station, checks them against the expected ranges, and stores the "
        "clean values in a shared table for later analysis. "
        "When the train finally arrived, the children ran along the platform "
        "and waved at the driver, who smiled and sounded the whistle twice. "
        "A good library holds more than books; it holds the quiet hours of "
        "everyone who ever sat at its long wooden tables to read and think."
    ),
    "es": (
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como estan de razon y conciencia, deben "
        "comportarse fraternalmente los unos con los otros. "
        "El rapido zorro marron salta sobre el perro perezoso cerca de la "
        "orilla del rio. "
        "Las canalizaciones de datos leen tablas, filtran filas y escriben "
        "los resultados en almacenamiento particionado todos los dias. "
        "Esta es una frase sencilla con palabras comunes del espanol que la "
        "gente usa cuando habla del trabajo y de la vida. "
        "Por la manana las calles del pueblo se llenan de gente que camina "
        "hacia sus oficinas y tiendas, y por la tarde las mismas calles los "
        "llevan de regreso a casa bajo la luz amarilla de las lamparas. "
        "Ella abrio la ventana y miro hacia el jardin, donde las primeras "
        "hojas del otono ya caian sobre la hierba mojada. "
        "El informe explica como el sistema recoge las medidas de cada "
        "estacion, las compara con los rangos esperados y guarda los valores "
        "limpios en una tabla compartida para su analisis posterior. "
        "Cuando el tren por fin llego, los ninos corrieron por el anden y "
        "saludaron al conductor, que sonrio e hizo sonar el silbato dos veces. "
        "Una buena biblioteca guarda mas que libros; guarda las horas "
        "tranquilas de todos los que alguna vez se sentaron a leer y pensar "
        "en sus largas mesas de madera."
    ),
    "pt": (
        "Todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos. Dotados de razao e de consciencia, devem agir uns para "
        "com os outros em espirito de fraternidade. "
        "A rapida raposa marrom salta sobre o cachorro preguicoso perto da "
        "margem do rio. "
        "Os pipelines de dados leem tabelas, filtram linhas e escrevem os "
        "resultados em armazenamento particionado todos os dias. "
        "Esta e uma frase simples com palavras comuns do portugues que as "
        "pessoas usam quando falam do trabalho e da vida. "
        "De manha as ruas da cidade se enchem de gente caminhando para os "
        "seus escritorios e lojas, e ao entardecer as mesmas ruas os levam "
        "de volta para casa sob a luz amarela dos postes. "
        "Ela abriu a janela e olhou para o jardim, onde as primeiras folhas "
        "do outono ja caiam sobre a grama molhada. "
        "O relatorio explica como o sistema recolhe as medidas de cada "
        "estacao, verifica os valores contra as faixas esperadas e guarda os "
        "dados limpos numa tabela compartilhada para analise posterior. "
        "Quando o trem finalmente chegou, as criancas correram pela "
        "plataforma e acenaram para o condutor, que sorriu e tocou o apito "
        "duas vezes. "
        "Uma boa biblioteca guarda mais do que livros; guarda as horas "
        "tranquilas de todos os que um dia se sentaram para ler e pensar em "
        "suas longas mesas de madeira."
    ),
}

SCALE = 1000  # integer weight = round(SCALE * ln P)
TOP_K_PER_LANG = 64


def normalize(text: str) -> str:
    """MUST mirror the runtime expression: lower → [^a-z ]→' ' → collapse
    spaces → trim."""
    t = re.sub(r"[^a-z ]", " ", text.lower())
    return re.sub(r" +", " ", t).strip()


def trigrams(text: str) -> list[str]:
    n = normalize(text)
    return [n[i : i + 3] for i in range(len(n) - 2)] if len(n) >= 3 else []


def main() -> None:
    langs = sorted(CORPUS)
    counts = {lang: Counter(trigrams(txt)) for lang, txt in CORPUS.items()}
    vocab: set[str] = set()
    for lang in langs:
        vocab.update(g for g, _ in counts[lang].most_common(TOP_K_PER_LANG))
    vocab_sorted = sorted(vocab)
    v = len(vocab_sorted)

    weights = []
    defaults = {}
    for lang in langs:
        n_total = sum(counts[lang].values())
        denom = n_total + v + 1  # Laplace over vocab + one unseen bucket
        defaults[lang] = round(SCALE * math.log(1 / denom))
    for g in vocab_sorted:
        row: dict[str, object] = {"g": g}
        for lang in langs:
            n_total = sum(counts[lang].values())
            denom = n_total + v + 1
            row[lang] = round(SCALE * math.log((counts[lang][g] + 1) / denom))
        weights.append(row)

    out = {
        "model": "char-trigram multinomial naive bayes",
        "scale": SCALE,
        "langs": langs,
        "defaults": defaults,
        "weights": weights,
    }
    path = (
        Path(__file__).resolve().parent.parent
        / "data_ingestion_bra_spark"
        / "config"
        / "langid_nb_weights.json"
    )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}: {len(weights)} grams x {len(langs)} langs")


if __name__ == "__main__":
    main()
