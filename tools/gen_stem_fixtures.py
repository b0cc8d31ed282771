#!/usr/bin/env python3
"""Generate golden Snowball-stemmer fixtures from PostgreSQL's dict_snowball.

Dev-time only (not part of the library): PostgreSQL 15 ships the compiled
Snowball 2.x stemmers for every language the reference supports
(/root/reference/src/tokenizer/stemmer.rs:12-30 via rust_stemmers). We feed
each language a word list (real stop-list words + curated inflected forms +
seeded synthetic root+suffix combos) and record `word<TAB>stem` pairs under
src/test/resources/stem/<lang>.tsv. SnowballSpec gates the Scala
implementations against these fixtures.

Usage: python3 tools/gen_stem_fixtures.py [lang ...]
Requires the scratch cluster:  pg_ctl -D /tmp/pgstem/data ... (see repo notes)
"""
import os
import random
import subprocess
import sys
import unicodedata

PGDIR = "/tmp/pgstem"
PORT = "54329"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "stem")
STOPDIR = "/usr/share/postgresql/15/tsearch_data"

# language -> (alphabet incl. specials, suffix inventory, curated real words)
LANGS = {}

def lang(name, alphabet, suffixes, words):
    LANGS[name] = (alphabet, suffixes, words)

lang("danish", "abcdefghijklmnopqrstuvwxyzæøå",
     ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne", "ere",
      "en", "heden", "eren", "er", "heder", "erer", "heds", "es", "endes", "erendes",
      "enes", "ernes", "eres", "ens", "hedens", "erens", "ers", "ets", "erets", "et",
      "eret", "gd", "dt", "gt", "kt", "igt", "elig", "lig", "els", "løst", "løs"],
     ["indeholdsfortegnelse", "undskyldning", "sparsommelighed", "dobbelt",
      "plejebarn", "venligst", "venlig", "hyggeligt", "bøgerne", "bogen",
      "kvinderne", "kvinde", "huset", "husene", "løbende", "løber", "løbets",
      "smukkeste", "smukkere", "arbejdsløshed", "følsomhed", "kærlighed"])

lang("norwegian", "abcdefghijklmnopqrstuvwxyzæøå",
     ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten", "ar",
      "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes", "ens", "hetens",
      "ers", "ets", "et", "het", "ast", "dt", "vt", "leg", "eleg", "ig", "eig",
      "lig", "elig", "els", "lov", "elov", "slov", "hetslov"],
     ["bøkene", "boken", "kvinnene", "kvinnen", "huset", "husene", "løpende",
      "vakreste", "vakrere", "arbeidsløshet", "kjærlighet", "vennlig", "hyggelig",
      "billigst", "tidligere", "muligheter", "mulighetene", "avdelingene"])

lang("swedish", "abcdefghijklmnopqrstuvwxyzäåö",
     ["a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande", "arne",
      "are", "aste", "en", "anden", "aren", "heten", "ern", "ar", "er", "heter",
      "or", "as", "arnas", "ernas", "ornas", "es", "ades", "andes", "ens", "arens",
      "hetens", "erns", "at", "andet", "het", "ast", "dd", "gd", "nn", "dt", "gt",
      "kt", "tt", "lig", "ig", "els", "fullt", "löst"],
     ["böckerna", "boken", "kvinnorna", "kvinnan", "huset", "husen", "löpande",
      "vackraste", "vackrare", "arbetslöshet", "kärleken", "vänligt", "trevligt",
      "billigast", "tidigare", "möjligheter", "möjligheterna", "avdelningarna"])

lang("german", "abcdefghijklmnopqrstuvwxyzäöüß",
     ["em", "ern", "er", "e", "en", "es", "s", "est", "ut", "end", "ung", "lich",
      "heit", "keit", "isch", "ik", "ig", "erin", "innen", "heiten", "ungen",
      "lichen", "ischen", "igkeit", "lichkeit", "keiten"],
     ["aufeinander", "abhängigkeit", "abhängig", "möglichkeiten", "möglichkeit",
      "freundlichen", "freundlich", "häuser", "hauses", "kinder", "kindern",
      "laufend", "gelaufen", "schönsten", "schönere", "arbeitslosigkeit",
      "wissenschaftlichen", "universitäten", "größte", "grüße", "weißt",
      "fußball", "straße", "süßigkeiten", "verständnis", "auffassung"])

lang("dutch", "abcdefghijklmnopqrstuvwxyzàèéëïöü",
     ["heden", "ene", "en", "se", "s", "e", "heid", "end", "end", "ing", "ig",
      "lijk", "baar", "bar", "iger", "igst", "ingen", "lijke", "lijkheid", "enie"],
     ["lichamelijkheden", "lichamelijk", "mogelijkheden", "mogelijkheid",
      "vriendelijke", "vriendelijk", "huizen", "huisje", "kinderen", "lopend",
      "gelopen", "mooiste", "mooiere", "werkloosheid", "wetenschappelijke",
      "universiteiten", "grootste", "groeten", "verjaardag", "gefeliciteerd",
      "ogenblikkelijk", "aanbieding", "bedoeling", "koninklijke"])

lang("french", "abcdefghijklmnopqrstuvwxyzâàçëéêèïîôûùüæœ",
     ["ance", "iqUe", "ique", "isme", "able", "iste", "eux", "ances", "iques",
      "ismes", "ables", "istes", "atrice", "ateur", "ation", "atrices", "ateurs",
      "ations", "logie", "logies", "usion", "ution", "usions", "utions", "ence",
      "ences", "ement", "ements", "ité", "ités", "if", "ive", "ifs", "ives",
      "eaux", "aux", "euse", "euses", "issement", "issements", "amment", "emment",
      "ment", "ments", "é", "ée", "ées", "és", "èrent", "er", "era", "erai",
      "eraIent", "eraient", "erais", "erait", "eras", "erez", "eriez", "erions",
      "erons", "eront", "ez", "iez", "ions", "îmes", "ît", "îtes", "i", "ie",
      "ies", "ir", "ira", "irai", "iraient", "irais", "irait", "iras", "irent",
      "irez", "iriez", "irions", "irons", "iront", "is", "issaIent", "issaient",
      "issais", "issait", "issant", "issante", "issantes", "issants", "isse",
      "issent", "isses", "issez", "issiez", "issions", "issons", "it", "ons",
      "ant", "ante", "antes", "ants", "ât", "ai", "aient", "ais", "ait", "as",
      "asse", "assent", "asses", "assiez", "assions", "e", "s", "eau", "al",
      "elle", "elles", "Ière", "ière", "Ier", "ier"],
     ["continuellement", "continuelle", "continuité", "majestueusement",
      "majestueux", "nationalisation", "nationale", "possibilités", "possible",
      "heureusement", "heureuse", "malheureusement", "finissaient", "finissons",
      "mangeaient", "mangerons", "mangé", "parlaient", "parlerions",
      "connaissance", "connaissons", "épouvantablement", "gouvernement",
      "arrivée", "allées", "château", "châteaux", "animaux", "animal",
      "yeux", "cheveux", "joyeux", "sérieusement", "précisément", "créée"])

lang("spanish", "abcdefghijklmnopqrstuvwxyzáéíóúüñ",
     ["anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos", "able",
      "ables", "ible", "ibles", "ista", "istas", "oso", "osa", "osos", "osas",
      "amiento", "amientos", "imiento", "imientos", "adora", "ador", "ación",
      "adoras", "adores", "aciones", "ante", "antes", "ancia", "ancias", "logía",
      "logías", "ución", "uciones", "encia", "encias", "amente", "mente", "idad",
      "idades", "iva", "ivo", "ivas", "ivos", "ya", "ye", "yan", "yen", "yeron",
      "yendo", "yo", "yó", "yas", "yes", "yais", "yamos", "en", "es", "éis",
      "emos", "aría", "arías", "arán", "arás", "aríais", "aríamos", "aremos",
      "aré", "arés", "ían", "ías", "íais", "íamos", "ieran", "iesen", "ieron",
      "iendo", "ieras", "ieses", "íste", "ísteis", "aba", "ada", "ida", "ía",
      "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
      "aban", "ían", "aran", "asen", "aron", "ando", "ado", "ido", "ando",
      "amos", "ábamos", "áramos", "iéramos", "iésemos", "ásemos", "o", "a", "e",
      "í", "ó", "os", "as"],
     ["torturadores", "tortura", "nacionalización", "nacional", "posibilidades",
      "posible", "felizmente", "feliz", "comieron", "comiendo", "comeremos",
      "hablaban", "hablaríamos", "conocimiento", "conocemos", "generosamente",
      "gobierno", "llegada", "salidas", "corazón", "corazones", "jóvenes",
      "fácilmente", "rápidamente", "enseñanza", "cantidades", "universidades"])

lang("portuguese", "abcdefghijklmnopqrstuvwxyzáâãàçéêíóôõú",
     ["eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
      "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento", "amentos",
      "imento", "imentos", "adora", "ador", "aça~o", "ação", "adoras", "adores",
      "ações", "logía", "logia", "logias", "ución", "ução", "uções", "ência",
      "ências", "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
      "ivos", "ira", "iras", "ada", "ida", "ia", "aria", "eria", "iria", "ará",
      "ara", "erá", "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
      "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam",
      "iriam", "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
      "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo", "ara~o",
      "arão", "era~o", "erão", "ira~o", "irão", "ar", "er", "ir", "as", "adas",
      "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás", "eras",
      "irás", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres", "ires",
      "asses", "esses", "isses", "astes", "estes", "istes", "is", "ais", "eis",
      "íeis", "aríeis", "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis",
      "íreis", "ireis", "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos",
      "ámos", "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
      "éramos", "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
      "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
      "eu", "iu", "ou", "ira", "iras", "e", "é", "ê", "a", "i", "o", "á", "í", "ó"],
     ["nacionalização", "nacional", "possibilidades", "possível", "felizmente",
      "feliz", "comeram", "comendo", "comeremos", "falavam", "falaríamos",
      "conhecimento", "conhecemos", "generosamente", "governo", "chegada",
      "saídas", "coração", "corações", "jovens", "facilmente", "rapidamente",
      "quantidades", "universidades", "proposição", "bilíngüe", "lingüística"])

lang("italian", "abcdefghijklmnopqrstuvwxyzàèéìíîòóùú",
     ["anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo", "ismi",
      "abile", "abili", "ibile", "ibili", "ista", "iste", "isti", "istà", "istè",
      "istì", "oso", "osi", "osa", "ose", "mente", "atrice", "atrici", "ante",
      "anti", "azione", "azioni", "atore", "atori", "logia", "logie", "uzione",
      "uzioni", "usione", "usioni", "enza", "enze", "amento", "amenti", "imento",
      "imenti", "amente", "ità", "ivo", "ivi", "iva", "ive", "icare", "ndo",
      "ando", "endo", "are", "ere", "ire", "asse", "assi", "assero", "assimo",
      "ato", "ata", "ati", "ate", "avo", "avi", "ava", "avamo", "avate", "avano",
      "erò", "erà", "erebbe", "erebbero", "eremmo", "eremo", "erete", "eranno",
      "erei", "eresti", "ereste", "eresti", "iamo", "iate", "ino", "ono", "ano",
      "iscano", "iscono", "isca", "isce", "isci", "isco", "irò", "irà", "irebbe",
      "irebbero", "iremmo", "iremo", "irete", "iranno", "irei", "iresti",
      "ireste", "ivo", "ivi", "iva", "ivamo", "ivate", "ivano", "ito", "ita",
      "iti", "ite", "uto", "uta", "uti", "ute", "ar", "ir", "o", "i", "a", "e",
      "é", "ì", "à", "ò", "ù"],
     ["nazionalizzazione", "nazionale", "possibilità", "possibile", "felicemente",
      "felice", "mangiarono", "mangiando", "mangeremo", "parlavano",
      "parleremmo", "conoscenza", "conosciamo", "generosamente", "governo",
      "arrivata", "uscite", "cuore", "cuori", "giovani", "facilmente",
      "rapidamente", "quantità", "università", "abbandonare", "pronunciare"])

lang("russian", "абвгдежзийклмнопрстуфхцчшщъыьэюяё",
     ["в", "вши", "вшись", "ив", "ивши", "ившись", "ыв", "ывши", "ывшись",
      "вш", "ивш", "ывш", "ущ", "ющ", "ащ", "ящ", "ем", "нн", "вши", " т",
      "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но", "ет",
      "ют", "ны", "ть", "ешь", "нно", "ила", "ыла", "ена", "ейте", "уйте",
      "ите", "или", "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило",
      "ыло", "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть",
      "ишь", "ую", "ю", "а", "ев", "ов", "ие", "ье", "е", "иями", "ями",
      "ами", "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям",
      "ием", "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
      "ью", "я", "ия", "ейше", "ейш", "ост", "ость", "и", "ыми", "его",
      "ого", "ему", "ому", "их", "ых", "ее", "ие", "ые", "ое", "ими", "ей",
      "ий", "ый", "ой", "ем", "им", "ым", "ом", "ая", "яя", "ою", "ею",
      "ест", "яще"],
     ["говорившие", "говорить", "работающий", "работала", "возможности",
      "возможность", "национализация", "национальный", "счастливейший",
      "красивейшая", "правительство", "университеты", "студентами",
      "книгами", "письмо", "письма", "дружественный", "быстрее",
      "интереснейшими", "замечательное", "продолжающаяся", "деятельность"])

lang("finnish", "abcdefghijklmnopqrstuvwxyzäö",
     ["kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä", "sti", "nsa",
      "nsä", "mme", "nne", "si", "ni", "an", "än", "en", "aan", "ään", "een",
      "han", "hen", "hin", "hon", "hän", "hön", "hun", "hyn", "uun", "yyn",
      "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle", "na", "nä",
      "ksi", "ine", "tta", "ttä", "ta", "tä", "a", "ä", "n", "impi", "impa",
      "impä", "immi", "imma", "immä", "eja", "ejä", "mma", "imma", "oma",
      "mpi", "mpa", "mpä", "mmi", "mma", "mmä", "eja", "ejä", "t", "ut", "yt",
      "ot", "öt", "itten", "iden", "in", "ien", "ten", "seen", "siin", "tten"],
     ["mahdollisuuksista", "mahdollisuus", "kansallistaminen", "kansallinen",
      "onnellisesti", "onnellinen", "söivät", "syömässä", "syömme", "puhuivat",
      "puhuisimme", "tietämys", "tiedämme", "ystävällisesti", "hallitus",
      "saapuminen", "lähdöt", "sydämet", "nuoret", "helposti", "nopeasti",
      "määrät", "yliopistot", "taloissansakaankohan", "järjestelmällisyys",
      "epäjärjestelmällistyttämättömyydelläänsäkäänköhän"])

lang("hungarian", "abcdefghijklmnopqrstuvwxyzáéíóöőúüű",
     ["al", "el", "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val",
      "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
      "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
      "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként", "ként",
      "en", "on", "an", "ön", "n", "t", "án", "én", "ánként", "astul",
      "estül", "stul", "stül", "ástul", "éstül", "á", "é", "ok", "ek", "ak",
      "ök", "k", "ék", "áké", "ééi", "é", "ké", "éké", "aké", "eké", "oké",
      "öké", "éi", "áéi", "ééi", "ei", "ai", "i", "unk", "ünk", "nk", "juk",
      "jük", "uk", "ük", "em", "om", "am", "m", "od", "ed", "ad", "öd", "d",
      "ja", "je", "a", "e", "o", "ánk", "énk", "ám", "ém", "ád", "éd", "ája",
      "éje", "uk", "ük", "juk", "jük", "ájuk", "éjük", "nk", "átok", "étek",
      "tok", "tek", "tök", "átok", "jaitok", "jeitek", "aitok", "eitek",
      "itek", "jeik", "jaik", "aik", "eik", "ik", "jaim", "jeim", "aim",
      "eim", "im", "jaid", "jeid", "aid", "eid", "id", "jai", "jei", "ai",
      "ei", "i", "jaink", "jeink", "eink", "aink", "ink"],
     ["lehetőségeinkről", "lehetőség", "nemzetközi", "nemzeti", "boldogan",
      "boldog", "ettek", "evés", "eszünk", "beszéltek", "beszélnénk",
      "ismeretek", "ismerjük", "barátságosan", "kormány", "érkezés",
      "indulások", "szívek", "fiatalok", "könnyen", "gyorsan", "mennyiségek",
      "egyetemek", "házaitokban", "legnagyobb", "legszebb", "babakocsi"])

lang("romanian", "abcdefghijklmnopqrstuvwxyzăâîșşțţ",
     ["ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei", "iile",
      "iilor", "ilor", "atori", "itori", "ători", "at", "ată", "ati", "ate",
      "ut", "ută", "uti", "ute", "it", "ită", "iti", "ite", "ic", "ica", "ice",
      "ici", "icume", "icai", "icei", "icel", "abil", "abila", "abile",
      "abili", "abilă", "ibil", "ibila", "ibile", "ibili", "ibilă", "oasa",
      "oasă", "oase", "os", "osi", "oși", "ant", "anta", "ante", "anti",
      "antă", "ator", "atoare", "ători", "ătoare", "itor", "itoare", "iv",
      "iva", "ive", "ivi", "ivă", "iune", "iuni", "ism", "isme", "ist", "ista",
      "iste", "isti", "istă", "iști", "ăm", "eam", "am", "iam", "em", "im",
      "âm", "ăi", "eai", "ai", "iai", "ei", "ii", "âi", "i", "ea", "ia", "a",
      "ă", "e", "ez", "ează", "eze", "ezi", "esc", "ește", "esti", "ești",
      "easca", "ească", "ați", "eați", "iați", "eți", "iți", "âți", "ară",
      "iră", "eră", "ând", "ind", "are", "ere", "ire", "âre", "se", "sese",
      "ăsei", "aserăm", "iserăm", "userăm", "seserăm", "sei", "serăm",
      "serăți", "seră", "u", "ului", "lui", "lor"],
     ["posibilitățile", "posibilitate", "naționalizare", "național",
      "fericire", "fericit", "mâncau", "mâncând", "vom", "vorbeau",
      "vorbiserăm", "cunoștințe", "cunoaștem", "prietenos", "guvernul",
      "sosirea", "plecările", "inimile", "tinerii", "ușor", "repede",
      "cantitățile", "universitățile", "abilitățile", "frumusețea",
      "copilăria", "călătorie", "întrebările", "răspunsurile"])

lang("turkish", "abcçdefgğhıijklmnoöprsştuüvyz",
     ["lar", "ler", "ları", "leri", "ın", "in", "un", "ün", "nın", "nin",
      "nun", "nün", "a", "e", "ya", "ye", "na", "ne", "da", "de", "ta", "te",
      "nda", "nde", "dan", "den", "tan", "ten", "ndan", "nden", "la", "le",
      "yla", "yle", "ca", "ce", "ça", "çe", "ım", "im", "um", "üm", "sın",
      "sin", "sun", "sün", "ız", "iz", "uz", "üz", "sınız", "siniz", "sunuz",
      "sünüz", "dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür", "dı",
      "di", "du", "dü", "tı", "ti", "tu", "tü", "sa", "se", "mış", "miş",
      "muş", "müş", "ken", "ardı", "erdi", "alı", "eli", "ınca", "ince",
      "unca", "ünce", "ıp", "ip", "up", "üp", "arak", "erek", "ır", "ir",
      "ur", "ür", "maz", "mez", "acak", "ecek", "acağı", "eceği", "ma", "me",
      "mak", "mek", "ış", "iş", "uş", "üş", "ı", "i", "u", "ü", "sı", "si",
      "su", "sü", "ları", "leri", "ımız", "imiz", "umuz", "ümüz", "ınız",
      "iniz", "unuz", "ünüz", "ki", "nca", "yken", "yım", "yim", "yum",
      "yüm", "ydı", "ydi", "ydu", "ydü", "ysa", "yse", "ymış", "ymiş",
      "ymuş", "ymüş", "yken", "yacak", "yecek", "casına", "cesine"],
     ["kitaplarımızdan", "kitap", "olanaklardan", "olanak", "mutluluk",
      "mutlu", "yediler", "yiyerek", "yiyeceğiz", "konuşuyorlardı",
      "konuşacaktık", "bilgilerimiz", "biliyoruz", "arkadaşça", "hükümet",
      "varış", "gidişler", "kalpler", "gençler", "kolayca", "hızlıca",
      "miktarlar", "üniversiteler", "evlerindeymiş", "çocuklarınızın",
      "güzelliğinden", "öğretmenlerimizin", "çekoslovakyalılaştıramadıklarımızdanmışsınızcasına"])

lang("arabic", "ابتثجحخدذرزسشصضطظعغفقكلمنهويىءآأؤإئة",
     ["ون", "ين", "ات", "ان", "كم", "كن", "هم", "هن", "ها", "نا", "ني", "وا",
      "تم", "تن", "ية", "ته", "تك", "تي", "تها", "هما", "كما", "ا", "ة", "ي",
      "ه", "ك", "ت", "ن", "و", "ال", "وال", "بال", "كال", "فال", "لل", "است",
      "مست", "يست", "تست", "نست", "سي", "سن", "ست", "سأ", "لي", "لن", "لت",
      "لل", "بم", "فس", "فب", "فل", "وس", "وي", "وت", "ون", "وب", "ول"],
     ["المدرسة", "مدرسة", "الكتاب", "كتابهم", "يكتبون", "مكتبات", "المعلمون",
      "المعلمات", "يدرسون", "دراسة", "الجامعات", "جامعة", "المستقبل",
      "استقبال", "يستقبلون", "الحكومة", "حكومات", "السيارات", "سيارة",
      "الأطفال", "أطفالهم", "المعلومات", "معلومة", "العربية", "عربي",
      "المسلمون", "الإسلام", "التعليم", "تعليمية", "والكتابة", "بالقراءة"])

lang("greek", "αβγδεζηθικλμνξοπρστυφχψωάέήίόύώϊϋΐΰς",
     ["φαγια", "φαγιου", "φαγιων", "σκαγια", "σκαγιου", "σκαγιων", "ολογιου",
      "ολογια", "ολογιων", "σογιου", "σογια", "σογιων", "τατογια", "τατογιου",
      "τατογιων", "εως", "εων", "ιου", "ια", "ιων", "ικα", "ικο", "ικου",
      "ικων", "αγαμε", "ηκαμε", "ηθηκαμε", "αμε", "ανε", "ετε", "ησατε",
      "ουμε", "ουνε", "ομαστε", "ιομαστε", "ομουνα", "οσουνα", "ιομουν",
      "ιοσουν", "οταν", "ιοταν", "ουνταν", "ιουνταν", "ονταν", "ιονταν",
      "οντουσαν", "ιοντουσαν", "ισμενος", "ισμενη", "ισμενο", "ισμενοι",
      "ισμενες", "ισμενα", "ισμα", "ισματος", "ισματα", "ισματων", "ιστε",
      "ιστος", "ιστη", "ιστο", "ιστοι", "ιστες", "ιστα", "ιστων", "ιστου",
      "ηθηκα", "ηθηκες", "ηθηκε", "ηθηκατε", "ηθηκαν", "ηκα", "ηκες", "ηκε",
      "ηκατε", "ηκαν", "ουσα", "ουσες", "ουσε", "ουσαμε", "ουσατε", "ουσαν",
      "αγα", "αγες", "αγε", "αγατε", "αγαν", "ησα", "ησες", "ησε", "ησατε",
      "ησαν", "ησου", "ησει", "ησεις", "ησουμε", "ησετε", "ησουν", "ιστικα",
      "ιστικο", "ιστικη", "ιστικες", "ιστικοι", "ιστικων", "ιστικου", "ας",
      "ες", "ος", "ης", "ου", "ων", "οι", "α", "ο", "η", "ι", "ε", "υ", "ω",
      "εις", "ει", "ουν", "ουμε", "ετε", "οντας", "ωντας", "ομαι", "εσαι",
      "εται", "ομαστε", "εστε", "ονται", "ηθω", "ηθεις", "ηθει", "ηθουμε",
      "ηθειτε", "ηθουν", "ματα", "ματος", "ματων", "μα", "τερος", "τερη",
      "τερο", "τατος", "τατη", "τατο"],
     ["δυνατότητες", "δυνατότητα", "εθνικοποίηση", "εθνικός", "ευτυχώς",
      "ευτυχισμένος", "έφαγαν", "τρώγοντας", "θα φάμε", "μιλούσαν",
      "μιλήσαμε", "γνώσεις", "γνωρίζουμε", "φιλικά", "κυβέρνηση", "άφιξη",
      "αναχωρήσεις", "καρδιές", "νέοι", "εύκολα", "γρήγορα", "ποσότητες",
      "πανεπιστήμια", "διαβάζοντας", "γράφουμε", "παιδιών", "ανθρώπων",
      "καλύτερος", "μεγαλύτερη", "ομορφότατος", "αγαπημένος", "δουλεύει"])

lang("tamil", "அஆஇஈஉஊஎஏஐஒஓஔகஙசஞடணதநபமயரலவழளறனஜஷஸஹ"
             "ாிீுூெேைொோௌ்",
     ["கள்", "களை", "களில்", "களின்", "களுக்கு", "களால்", "களோடு", "ை", "ில்",
      "ின்", "ுக்கு", "ால்", "ோடு", "உடன்", "ிலிருந்து", "ிடம்", "ாக", "ாய்",
      "ான", "ென்று", "ாவது", "ும்", "ோ", "ே", "ா", "கிறது", "கிறார்",
      "கிறான்", "கிறாள்", "கிறார்கள்", "கின்றன", "ந்தது", "ந்தார்", "ந்தான்",
      "ந்தாள்", "ந்தார்கள்", "ந்தன", "வது", "ப்பது", "க்கிறது", "த்தில்",
      "த்தின்", "த்தை", "த்தால்", "த்துக்கு", "ங்கள்", "ங்களில்", "ங்களை",
      "ியது", "ியன", "ியவர்", "ிய", "ியில்", "ாமல்", "ாது", "ட்டு", "ட்டது",
      "ப்பட்ட", "ப்பட்டது", "ப்படுகிறது", "யுள்ள", "ுள்ள", "ுடைய", "ினுடைய",
      "ினால்", "ீர்கள்", "ோம்", "ேன்", "ாள்", "ான்", "ார்", "ார்கள்"],
     ["புத்தகங்களில்", "புத்தகம்", "மாணவர்கள்", "மாணவன்", "படிக்கிறார்கள்",
      "படித்தான்", "பள்ளிக்கு", "பள்ளியில்", "வீடுகளின்", "வீட்டில்",
      "சென்றார்கள்", "செல்கிறது", "மகிழ்ச்சியாக", "மகிழ்ச்சி", "அரசாங்கம்",
      "பல்கலைக்கழகங்கள்", "குழந்தைகளுக்கு", "தமிழ்நாட்டில்", "எழுதுகிறேன்",
      "பேசுகிறோம்", "வந்தவர்கள்", "போகிறவன்", "அழகான", "விரைவாக",
      "நண்பர்களுடன்", "ஆசிரியர்களின்"])

lang("english", "abcdefghijklmnopqrstuvwxyz",
     ["ing", "ed", "s", "es", "ies", "ly", "ation", "ization", "izations",
      "ational", "tional", "enci", "anci", "izer", "bli", "alli", "entli",
      "eli", "ousli", "fulness", "ousness", "iveness", "ical", "icate",
      "iciti", "ful", "ness", "ative", "alize", "ement", "ment", "ent", "ism",
      "ate", "iti", "ous", "ive", "ize", "ional", "ance", "ence", "able",
      "ible", "ant", "eed", "eedly", "ingly", "edly", "ier", "iest", "est"],
     ["nationalization", "possibilities", "happily", "running", "flies",
      "agreed", "generously", "dogs", "churches", "sensational",
      "traditional", "references", "colonizer", "hopefulness", "callousness",
      "formative", "formalize", "electricity", "electrical", "hopeful",
      "goodness", "radicalli", "differentli", "vileli", "analogousli"])


def syllables(alphabet):
    vowels_by_lang = "aeiouyäöüåæøáéíóúàèìòùâêîôûëïãõăâîыаеиоуэюяёαεηιουωάέήίόύώıİ"
    v = [c for c in alphabet if c in vowels_by_lang]
    c = [ch for ch in alphabet if ch not in v]
    return v or list(alphabet), c or list(alphabet)


def gen_words(name, alphabet, suffixes, curated, rng):
    words = set()
    stopfile = os.path.join(STOPDIR, f"{name}.stop")
    if os.path.exists(stopfile):
        for line in open(stopfile, encoding="utf-8"):
            w = line.strip().lower()
            if w:
                words.add(w)
    for w in curated:
        for tok in w.split():
            words.add(tok.lower())
    v, c = syllables(alphabet)

    def root(minsyl=1, maxsyl=4):
        n = rng.randint(minsyl, maxsyl)
        out = []
        for _ in range(n):
            if rng.random() < 0.25:
                out.append(rng.choice(v))
            else:
                out.append(rng.choice(c) + rng.choice(v))
            if rng.random() < 0.3:
                out.append(rng.choice(c))
        return "".join(out)

    # root + suffix combos (dense coverage of rule interactions)
    for _ in range(2600):
        w = root()
        k = rng.random()
        if k < 0.45:
            w += rng.choice(suffixes)
        elif k < 0.8:
            w += rng.choice(suffixes) + rng.choice(suffixes)
        # else: bare root
        words.add(w.lower())
    # every suffix on a couple of short fixed roots (R1/R2-empty edge cases)
    short_roots = ["", v[0], c[0] + v[0], v[0] + c[0], c[0] + v[0] + c[0]]
    for s in suffixes:
        for r in short_roots:
            if r + s:
                words.add((r + s).lower())
    # pure random strings
    for _ in range(400):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        words.add(w.lower())
    words.discard("")
    return sorted(w for w in words
                  if unicodedata.normalize("NFC", w) == w and "\t" not in w)


def psql(sql):
    r = subprocess.run(
        ["su", "postgres", "-c",
         f"cd /tmp && psql -h {PGDIR} -p {PORT} -d postgres -qAtX"],
        input=sql, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr)
    return r.stdout


def main():
    only = set(sys.argv[1:])
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20260817)
    for name, (alphabet, suffixes, curated) in LANGS.items():
        if only and name not in only:
            continue
        words = gen_words(name, alphabet, suffixes, curated, rng)
        psql(f"DROP TEXT SEARCH DICTIONARY IF EXISTS g_{name};\n"
             f"CREATE TEXT SEARCH DICTIONARY g_{name} "
             f"(TEMPLATE = snowball, Language = '{name}');")
        listfile = f"/tmp/pgstem/words_{name}.txt"
        with open(listfile, "w", encoding="utf-8") as f:
            f.write("\n".join(words))
        os.chmod(listfile, 0o644)
        sql = (
            "DROP TABLE IF EXISTS w; CREATE TABLE w(word text);\n"
            f"\\copy w FROM '{listfile}'\n"
            f"SELECT word || E'\\t' || (ts_lexize('g_{name}', word))[1] FROM w "
            "WHERE array_length(ts_lexize('g_%s', word), 1) = 1 ORDER BY word;" % name
        )
        out = psql(sql)
        path = os.path.join(OUT, f"{name}.tsv")
        with open(path, "w", encoding="utf-8") as f:
            f.write(out)
        n = out.count("\n")
        print(f"{name}: {n} pairs -> {path}")


if __name__ == "__main__":
    main()
