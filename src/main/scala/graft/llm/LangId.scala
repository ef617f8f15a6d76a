package graft.llm

import org.apache.spark.sql.Column

/** Real n-gram language identification — character-n-gram rank profiles
  * (the public TextCat method, Cavnar & Trenkle 1994) trained ONCE from the
  * in-repo seed corpora below, replacing the stopword-hit heuristic
  * ([[TextStats.languageId]]) for pipelines that must separate close
  * languages (es/pt/it, de/nl/sv) and classify short documents.
  *
  * Scale shape: classification is [[graft.functions.LangIdNgramExpr]], a
  * narrow codegen'd projection with the trained profiles riding as a
  * reference object — zero shuffles, streaming-safe, bounded per-row cost
  * (only the first 4 KiB of a document is profiled). Profile training is a
  * driver-side one-off at class load over the fixed seed corpora — never
  * per job, never over the corpus being classified.
  *
  * The seed corpora are ORIGINAL prose written for this repository (two
  * disjoint sets per language: `seedCorpora` trains the profiles,
  * `heldOutSentences` exists so tests and the q179 invariant measure
  * accuracy on text the profiles never saw). Ten languages with shared
  * Latin script — the hard case where script detection alone says nothing.
  */
object LangId {

  /** Training text per language code (ISO 639-1). Each is one paragraph of
    * original prose — enough for stable 1..5-gram rank profiles of the
    * function words and morphology that distinguish the language.
    */
  val seedCorpora: Map[String, String] = Map(
    "en" -> ("The weather in the north of the country changes quickly during " +
      "the autumn months. Many people who live near the coast say that the wind " +
      "and the rain arrive together with the first cold days. Children walk to " +
      "school in the morning and talk about the things they have seen on the " +
      "way. The government has announced that the new road between the two " +
      "cities will be finished next year. Most of the families in the region " +
      "work in farming and fishing, and the market in the old town is open " +
      "every day of the week." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "In the evening the family gathers in the kitchen and prepares a " +
      "simple meal together. My grandmother always said that a good soup " +
      "needs time and patience. When the lights go out, the children tell " +
      "each other stories until they fall asleep. The old man who lives " +
      "next door keeps a garden full of apples and plums, and he gives the " +
      "neighbours a basket of fruit every autumn." +
      " " +
      "She was in the living room when he opened the door and came in " +
      "with the dog. The room was at the end of the corridor, next to the " +
      "big window that looked over the river. We like walking by the sea " +
      "when it is not too cold. He said he would arrive early, but the " +
      "train was late again. The streets of the city fill with people at " +
      "the end of the afternoon, and the shops only close when it is " +
      "already night."),
    "de" -> ("Das Wetter im Norden des Landes ändert sich im Herbst sehr " +
      "schnell. Viele Menschen, die an der Küste wohnen, sagen, dass der Wind " +
      "und der Regen zusammen mit den ersten kalten Tagen kommen. Die Kinder " +
      "gehen morgens zur Schule und sprechen über die Dinge, die sie unterwegs " +
      "gesehen haben. Die Regierung hat angekündigt, dass die neue Straße " +
      "zwischen den beiden Städten im nächsten Jahr fertig sein wird. Die " +
      "meisten Familien in der Region arbeiten in der Landwirtschaft und in " +
      "der Fischerei, und der Markt in der Altstadt ist jeden Tag geöffnet." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "Am Abend versammelt sich die Familie in der Küche und bereitet " +
      "gemeinsam ein einfaches Essen zu. Meine Großmutter sagte immer, dass " +
      "eine gute Suppe Zeit und Geduld braucht. Wenn das Licht ausgeht, " +
      "erzählen sich die Kinder Geschichten, bis sie einschlafen. Der alte " +
      "Mann, der nebenan wohnt, pflegt einen Garten voller Äpfel und " +
      "Pflaumen, und er schenkt den Nachbarn jeden Herbst einen Korb mit " +
      "Obst." +
      " " +
      "Sie war im Wohnzimmer, als er die Tür öffnete und mit dem Hund " +
      "hereinkam. Das Zimmer lag am Ende des Flurs, neben dem großen " +
      "Fenster mit Blick auf den Fluss. Wir gehen gern am Meer spazieren, " +
      "wenn es nicht zu kalt ist. Er sagte, er würde früh kommen, aber " +
      "der Zug hatte wieder Verspätung. Die Straßen der Stadt füllen sich " +
      "am späten Nachmittag mit Menschen, und die Geschäfte schließen " +
      "erst, wenn es schon dunkel ist."),
    "fr" -> ("Le temps dans le nord du pays change très vite pendant les mois " +
      "d'automne. Beaucoup de gens qui habitent près de la côte disent que le " +
      "vent et la pluie arrivent avec les premiers jours froids. Les enfants " +
      "vont à l'école le matin et parlent des choses qu'ils ont vues en " +
      "chemin. Le gouvernement a annoncé que la nouvelle route entre les deux " +
      "villes sera terminée l'année prochaine. La plupart des familles de la " +
      "région travaillent dans l'agriculture et la pêche, et le marché de la " +
      "vieille ville est ouvert tous les jours de la semaine." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "Le soir, la famille se réunit dans la cuisine et prépare ensemble un " +
      "repas simple. Ma grand-mère disait toujours qu'une bonne soupe " +
      "demande du temps et de la patience. Quand la lumière s'éteint, les " +
      "enfants se racontent des histoires jusqu'à ce qu'ils s'endorment. Le " +
      "vieil homme qui habite à côté entretient un jardin plein de pommes " +
      "et de prunes, et il offre aux voisins un panier de fruits chaque " +
      "automne." +
      " " +
      "Elle était dans le salon quand il a ouvert la porte et est entré " +
      "avec le chien. La chambre se trouvait au bout du couloir, à côté " +
      "de la grande fenêtre qui donnait sur le fleuve. Nous aimons nous " +
      "promener au bord de la mer quand il ne fait pas trop froid. Il a " +
      "dit qu'il arriverait tôt, mais le train était encore en retard. " +
      "Les rues de la ville se remplissent de monde en fin d'après-midi, " +
      "et les magasins ne ferment que lorsqu'il fait déjà nuit."),
    "es" -> ("El tiempo en el norte del país cambia muy rápido durante los " +
      "meses de otoño. Mucha gente que vive cerca de la costa dice que el " +
      "viento y la lluvia llegan junto con los primeros días fríos. Los niños " +
      "van a la escuela por la mañana y hablan de las cosas que han visto por " +
      "el camino. El gobierno ha anunciado que la nueva carretera entre las " +
      "dos ciudades estará terminada el año que viene. La mayoría de las " +
      "familias de la región trabajan en la agricultura y la pesca, y el " +
      "mercado del casco antiguo está abierto todos los días de la semana." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "Por la noche la familia se reúne en la cocina y prepara junta una " +
      "comida sencilla. Mi abuela siempre decía que una buena sopa necesita " +
      "tiempo y paciencia. Cuando se apaga la luz, los niños se cuentan " +
      "historias hasta que se duermen. El anciano que vive al lado cuida un " +
      "jardín lleno de manzanas y ciruelas, y regala a los vecinos una " +
      "cesta de fruta cada otoño." +
      " " +
      "Ella estaba en el salón cuando él abrió la puerta y entró con el " +
      "perro. La habitación quedaba al final del pasillo, junto a la " +
      "ventana grande que daba al río. Nos gusta mucho pasear por la " +
      "orilla del mar cuando no hace demasiado frío. Él dijo que llegaría " +
      "temprano, pero el tren estaba retrasado otra vez. Las calles de la " +
      "ciudad se llenan de gente al final de la tarde, y las tiendas solo " +
      "cierran cuando ya es de noche."),
    "pt" -> ("O tempo no norte do país muda muito depressa durante os meses " +
      "de outono. Muitas pessoas que vivem perto da costa dizem que o vento e " +
      "a chuva chegam junto com os primeiros dias frios. As crianças vão à " +
      "escola de manhã e falam sobre as coisas que viram pelo caminho. O " +
      "governo anunciou que a nova estrada entre as duas cidades estará " +
      "pronta no próximo ano. A maioria das famílias da região trabalha na " +
      "agricultura e na pesca, e o mercado da cidade velha está aberto todos " +
      "os dias da semana." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "À noite a família se reúne na cozinha e prepara junta uma refeição " +
      "simples. A minha avó sempre dizia que uma boa sopa precisa de tempo " +
      "e de paciência. Quando a luz se apaga, as crianças contam histórias " +
      "umas às outras até adormecerem. O velho que mora ao lado cuida de um " +
      "jardim cheio de maçãs e ameixas, e ele dá aos vizinhos um cesto de " +
      "fruta todos os outonos. Eles não tinham visto nada parecido antes, " +
      "porque aquela casa ficava longe da aldeia e o caminho estava sempre " +
      "molhado." +
      " " +
      "Ela estava na sala quando ele abriu a porta e entrou com o cão. O " +
      "quarto ficava no fim do corredor, ao lado da janela grande que dava " +
      "para o rio. Nós gostamos muito de passear à beira-mar quando não " +
      "está frio demais. Ele disse que ia chegar cedo, mas o comboio " +
      "estava atrasado outra vez. As ruas da cidade ficam cheias de gente " +
      "ao fim da tarde, e as lojas só fecham quando já é noite."),
    "it" -> ("Il tempo nel nord del paese cambia molto velocemente durante i " +
      "mesi autunnali. Molte persone che vivono vicino alla costa dicono che " +
      "il vento e la pioggia arrivano insieme ai primi giorni freddi. I " +
      "bambini vanno a scuola la mattina e parlano delle cose che hanno visto " +
      "lungo la strada. Il governo ha annunciato che la nuova strada tra le " +
      "due città sarà finita l'anno prossimo. La maggior parte delle famiglie " +
      "della regione lavora nell'agricoltura e nella pesca, e il mercato " +
      "della città vecchia è aperto tutti i giorni della settimana." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "La sera la famiglia si riunisce in cucina e prepara insieme un pasto " +
      "semplice. Mia nonna diceva sempre che una buona zuppa ha bisogno di " +
      "tempo e di pazienza. Quando si spegne la luce, i bambini si " +
      "raccontano storie finché non si addormentano. Il vecchio che abita " +
      "accanto cura un giardino pieno di mele e di prugne, e regala ai " +
      "vicini un cesto di frutta ogni autunno." +
      " " +
      "Lei era in soggiorno quando lui ha aperto la porta ed è entrato " +
      "con il cane. La stanza si trovava in fondo al corridoio, accanto " +
      "alla grande finestra che dava sul fiume. Ci piace molto " +
      "passeggiare in riva al mare quando non fa troppo freddo. Lui ha " +
      "detto che sarebbe arrivato presto, ma il treno era di nuovo in " +
      "ritardo. Le strade della città si riempiono di gente nel tardo " +
      "pomeriggio, e i negozi chiudono solo quando è già notte."),
    "nl" -> ("Het weer in het noorden van het land verandert snel tijdens de " +
      "herfstmaanden. Veel mensen die aan de kust wonen, zeggen dat de wind " +
      "en de regen samen met de eerste koude dagen aankomen. De kinderen " +
      "lopen 's morgens naar school en praten over de dingen die ze onderweg " +
      "hebben gezien. De regering heeft aangekondigd dat de nieuwe weg tussen " +
      "de twee steden volgend jaar klaar zal zijn. De meeste gezinnen in de " +
      "regio werken in de landbouw en de visserij, en de markt in de oude " +
      "stad is elke dag van de week open." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "'s Avonds komt het gezin samen in de keuken en bereidt samen een " +
      "eenvoudige maaltijd. Mijn grootmoeder zei altijd dat een goede soep " +
      "tijd en geduld nodig heeft. Als het licht uitgaat, vertellen de " +
      "kinderen elkaar verhalen totdat ze in slaap vallen. De oude man die " +
      "hiernaast woont, onderhoudt een tuin vol appels en pruimen, en hij " +
      "geeft de buren elke herfst een mand met fruit." +
      " " +
      "Ze was in de woonkamer toen hij de deur opende en met de hond " +
      "binnenkwam. De kamer lag aan het einde van de gang, naast het " +
      "grote raam dat uitkeek op de rivier. We wandelen graag langs de " +
      "zee als het niet te koud is. Hij zei dat hij vroeg zou komen, maar " +
      "de trein had weer vertraging. De straten van de stad lopen aan het " +
      "einde van de middag vol met mensen, en de winkels sluiten pas als " +
      "het al donker is."),
    "sv" -> ("Vädret i norra delen av landet förändras snabbt under " +
      "höstmånaderna. Många människor som bor nära kusten säger att vinden " +
      "och regnet kommer tillsammans med de första kalla dagarna. Barnen går " +
      "till skolan på morgonen och pratar om de saker som de har sett på " +
      "vägen. Regeringen har meddelat att den nya vägen mellan de två " +
      "städerna kommer att vara färdig nästa år. De flesta familjerna i " +
      "regionen arbetar med jordbruk och fiske, och marknaden i den gamla " +
      "staden är öppen varje dag i veckan." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "På kvällen samlas familjen i köket och lagar en enkel måltid " +
      "tillsammans. Min mormor sade alltid att en god soppa behöver tid och " +
      "tålamod. När ljuset släcks berättar barnen historier för varandra " +
      "tills de somnar. Den gamle mannen som bor bredvid sköter en trädgård " +
      "full av äpplen och plommon, och han ger grannarna en korg med frukt " +
      "varje höst." +
      " " +
      "Hon var i vardagsrummet när han öppnade dörren och kom in med " +
      "hunden. Rummet låg i slutet av korridoren, bredvid det stora " +
      "fönstret som vette mot floden. Vi tycker om att promenera vid " +
      "havet när det inte är för kallt. Han sade att han skulle komma " +
      "tidigt, men tåget var försenat igen. Stadens gator fylls av " +
      "människor sent på eftermiddagen, och butikerna stänger först när " +
      "det redan är mörkt."),
    "pl" -> ("Pogoda na północy kraju zmienia się szybko w miesiącach " +
      "jesiennych. Wielu ludzi mieszkających blisko wybrzeża mówi, że wiatr " +
      "i deszcz przychodzą razem z pierwszymi zimnymi dniami. Dzieci idą " +
      "rano do szkoły i rozmawiają o rzeczach, które widziały po drodze. " +
      "Rząd ogłosił, że nowa droga między dwoma miastami będzie gotowa w " +
      "przyszłym roku. Większość rodzin w regionie pracuje w rolnictwie i " +
      "rybołówstwie, a targ na starym mieście jest otwarty każdego dnia " +
      "tygodnia." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "Wieczorem rodzina zbiera się w kuchni i razem przygotowuje prosty " +
      "posiłek. Moja babcia zawsze mówiła, że dobra zupa potrzebuje czasu i " +
      "cierpliwości. Kiedy gaśnie światło, dzieci opowiadają sobie " +
      "historie, aż zasną. Stary człowiek, który mieszka obok, dba o ogród " +
      "pełen jabłek i śliwek, i co jesień daje sąsiadom kosz owoców." +
      " " +
      "Była w salonie, kiedy otworzył drzwi i wszedł z psem. Pokój " +
      "znajdował się na końcu korytarza, obok dużego okna, które " +
      "wychodziło na rzekę. Lubimy spacerować nad morzem, kiedy nie jest " +
      "zbyt zimno. Powiedział, że przyjdzie wcześnie, ale pociąg znowu " +
      "się spóźnił. Ulice miasta zapełniają się ludźmi pod koniec " +
      "popołudnia, a sklepy zamykają się dopiero wtedy, gdy jest już " +
      "ciemno."),
    "tr" -> ("Ülkenin kuzeyinde hava sonbahar aylarında çok hızlı değişir. " +
      "Kıyıya yakın yaşayan birçok insan, rüzgarın ve yağmurun ilk soğuk " +
      "günlerle birlikte geldiğini söyler. Çocuklar sabahları okula yürür ve " +
      "yolda gördükleri şeyler hakkında konuşur. Hükümet, iki şehir " +
      "arasındaki yeni yolun gelecek yıl bitirileceğini açıkladı. Bölgedeki " +
      "ailelerin çoğu tarım ve balıkçılıkla uğraşır ve eski şehirdeki pazar " +
      "haftanın her günü açıktır." +
      " " +
      // second paragraph: different topic, same register — richer
      // function-word and morphology coverage for the close pairs
      "Akşamları aile mutfakta toplanır ve birlikte basit bir yemek " +
      "hazırlar. Büyükannem her zaman iyi bir çorbanın zaman ve sabır " +
      "istediğini söylerdi. Işıklar sönünce çocuklar uyuyana kadar " +
      "birbirlerine hikayeler anlatır. Yan tarafta oturan yaşlı adam elma " +
      "ve erik dolu bir bahçeye bakar ve her sonbahar komşulara bir sepet " +
      "meyve verir." +
      " " +
      "O, köpekle birlikte kapıyı açıp içeri girdiğinde kadın oturma " +
      "odasındaydı. Oda koridorun sonunda, nehre bakan büyük pencerenin " +
      "yanındaydı. Hava çok soğuk olmadığında deniz kenarında yürümeyi " +
      "severiz. Erken geleceğini söyledi ama tren yine gecikmişti. Şehrin " +
      "sokakları öğleden sonra insanlarla dolar ve dükkanlar ancak hava " +
      "karardığında kapanır."))

  /** Held-out evaluation sentences per language — deliberately DIFFERENT
    * content from [[seedCorpora]] (different topics, vocabulary overlap
    * limited to function words), so accuracy measured on them is accuracy
    * on unseen text, not memorization.
    */
  val heldOutSentences: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "She opened the window because the room was too warm.",
      "The library closes earlier on Sundays than on other days.",
      "We found a small boat near the river last summer.",
      "His brother works at the hospital in the city center.",
      "They have never seen snow before this winter.",
      "The teacher asked the students to write a short story."),
    "de" -> Seq(
      "Sie öffnete das Fenster, weil das Zimmer zu warm war.",
      "Die Bibliothek schließt sonntags früher als an anderen Tagen.",
      "Wir fanden letzten Sommer ein kleines Boot am Fluss.",
      "Sein Bruder arbeitet im Krankenhaus im Stadtzentrum.",
      "Sie haben vor diesem Winter noch nie Schnee gesehen.",
      "Der Lehrer bat die Schüler, eine kurze Geschichte zu schreiben."),
    "fr" -> Seq(
      "Elle a ouvert la fenêtre parce que la chambre était trop chaude.",
      "La bibliothèque ferme plus tôt le dimanche que les autres jours.",
      "Nous avons trouvé un petit bateau près de la rivière l'été dernier.",
      "Son frère travaille à l'hôpital au centre de la ville.",
      "Ils n'ont jamais vu de neige avant cet hiver.",
      "Le professeur a demandé aux élèves d'écrire une courte histoire."),
    "es" -> Seq(
      "Ella abrió la ventana porque la habitación estaba demasiado caliente.",
      "La biblioteca cierra más temprano los domingos que los demás días.",
      "Encontramos un barco pequeño cerca del río el verano pasado.",
      "Su hermano trabaja en el hospital del centro de la ciudad.",
      "Nunca habían visto la nieve antes de este invierno.",
      "El maestro pidió a los alumnos que escribieran una historia corta."),
    "pt" -> Seq(
      "Ela abriu a janela porque o quarto estava quente demais.",
      "A biblioteca fecha mais cedo aos domingos do que nos outros dias.",
      "Encontramos um barco pequeno perto do rio no verão passado.",
      "O irmão dele trabalha no hospital no centro da cidade.",
      "Eles nunca tinham visto neve antes deste inverno.",
      "O professor pediu aos alunos que escrevessem uma história curta."),
    "it" -> Seq(
      "Lei ha aperto la finestra perché la stanza era troppo calda.",
      "La biblioteca chiude prima la domenica rispetto agli altri giorni.",
      "Abbiamo trovato una piccola barca vicino al fiume l'estate scorsa.",
      "Suo fratello lavora all'ospedale nel centro della città.",
      "Non avevano mai visto la neve prima di questo inverno.",
      "Il maestro ha chiesto agli alunni di scrivere una storia breve."),
    "nl" -> Seq(
      "Ze opende het raam omdat de kamer te warm was.",
      "De bibliotheek sluit op zondag vroeger dan op andere dagen.",
      "We vonden vorige zomer een kleine boot bij de rivier.",
      "Zijn broer werkt in het ziekenhuis in het centrum van de stad.",
      "Ze hebben voor deze winter nog nooit sneeuw gezien.",
      "De leraar vroeg de leerlingen een kort verhaal te schrijven."),
    "sv" -> Seq(
      "Hon öppnade fönstret eftersom rummet var för varmt.",
      "Biblioteket stänger tidigare på söndagar än på andra dagar.",
      "Vi hittade en liten båt nära floden förra sommaren.",
      "Hans bror arbetar på sjukhuset i stadens centrum.",
      "De har aldrig sett snö före den här vintern.",
      "Läraren bad eleverna att skriva en kort berättelse."),
    "pl" -> Seq(
      "Otworzyła okno, ponieważ w pokoju było za ciepło.",
      "Biblioteka zamyka się w niedziele wcześniej niż w inne dni.",
      "Zeszłego lata znaleźliśmy małą łódkę nad rzeką.",
      "Jego brat pracuje w szpitalu w centrum miasta.",
      "Nigdy wcześniej nie widzieli śniegu przed tą zimą.",
      "Nauczyciel poprosił uczniów o napisanie krótkiego opowiadania."),
    "tr" -> Seq(
      "Oda çok sıcak olduğu için pencereyi açtı.",
      "Kütüphane pazar günleri diğer günlerden daha erken kapanır.",
      "Geçen yaz nehrin yakınında küçük bir tekne bulduk.",
      "Kardeşi şehir merkezindeki hastanede çalışıyor.",
      "Bu kıştan önce hiç kar görmemişlerdi.",
      "Öğretmen öğrencilerden kısa bir hikaye yazmalarını istedi."))

  /** Fourth seed paragraph per language (appended to [[seedCorpora]] at
    * profile-training time): everyday work/health/city vocabulary,
    * original prose. Added in round 14 to widen the margin between
    * in-set held-out scores and the out-of-set `und` floor — thin
    * profiles made borderline in-set sentences score near the floor. */
  val seedCorporaExtra: Map[String, String] = Map(
    "en" -> ("My sister works as a nurse at the hospital near the main square. " +
      "Every morning she takes the train to the city centre and buys a coffee " +
      "at the small bakery next to the station. The doctor told him to rest " +
      "for a week and drink plenty of water. On Saturdays the market sells " +
      "fresh bread, cheese and vegetables from the nearby farms. The city " +
      "library lends books, films and music to anyone who lives in the " +
      "district."),
    "de" -> ("Meine Schwester arbeitet als Krankenschwester im Krankenhaus in " +
      "der Nähe des Hauptplatzes. Jeden Morgen nimmt sie den Zug ins " +
      "Stadtzentrum und kauft einen Kaffee in der kleinen Bäckerei neben dem " +
      "Bahnhof. Der Arzt sagte ihm, er solle eine Woche lang ruhen und viel " +
      "Wasser trinken. Samstags verkauft der Markt frisches Brot, Käse und " +
      "Gemüse von den Höfen in der Umgebung. Die Stadtbibliothek verleiht " +
      "Bücher, Filme und Musik an alle, die im Viertel wohnen."),
    "fr" -> ("Ma sœur travaille comme infirmière à l'hôpital près de la place " +
      "principale. Chaque matin, elle prend le train pour le centre-ville et " +
      "achète un café à la petite boulangerie à côté de la gare. Le médecin " +
      "lui a dit de se reposer pendant une semaine et de boire beaucoup " +
      "d'eau. Le samedi, le marché vend du pain frais, du fromage et des " +
      "légumes des fermes voisines. La bibliothèque municipale prête des " +
      "livres, des films et de la musique à tous ceux qui habitent le " +
      "quartier. On ne voyage jamais pendant l'hiver, car la neige couvre " +
      "les routes avant le matin, et cet air froid vient du nord."),
    "es" -> ("Mi hermana trabaja como enfermera en el hospital cerca de la " +
      "plaza principal. Cada mañana toma el tren al centro de la ciudad y " +
      "compra un café en la pequeña panadería junto a la estación. El médico " +
      "le dijo que descansara una semana y bebiera mucha agua. Los sábados el " +
      "mercado vende pan fresco, queso y verduras de las granjas cercanas. La " +
      "biblioteca municipal presta libros, películas y música a todos los que " +
      "viven en el barrio."),
    "pt" -> ("A minha irmã trabalha como enfermeira no hospital perto da " +
      "praça principal. Todas as manhãs apanha o comboio para o centro da " +
      "cidade e compra um café na pequena padaria ao lado da estação. O " +
      "médico disse-lhe para descansar uma semana e beber muita água. Aos " +
      "sábados o mercado vende pão fresco, queijo e legumes das quintas " +
      "vizinhas. A biblioteca municipal empresta livros, filmes e música a " +
      "todos os que vivem no bairro."),
    "it" -> ("Mia sorella lavora come infermiera all'ospedale vicino alla " +
      "piazza principale. Ogni mattina prende il treno per il centro della " +
      "città e compra un caffè nella piccola panetteria accanto alla " +
      "stazione. Il medico gli ha detto di riposare per una settimana e di " +
      "bere molta acqua. Il sabato il mercato vende pane fresco, formaggio e " +
      "verdure delle fattorie vicine. La biblioteca comunale presta libri, " +
      "film e musica a tutti quelli che vivono nel quartiere."),
    "nl" -> ("Mijn zus werkt als verpleegster in het ziekenhuis bij het grote " +
      "plein. Elke ochtend neemt ze de trein naar het centrum van de stad en " +
      "koopt ze koffie bij de kleine bakkerij naast het station. De dokter " +
      "zei dat hij een week moest rusten en veel water moest drinken. Op " +
      "zaterdag verkoopt de markt vers brood, kaas en groenten van de " +
      "boerderijen in de buurt. De stadsbibliotheek leent boeken, films en " +
      "muziek uit aan iedereen die in de wijk woont."),
    "sv" -> ("Min syster arbetar som sjuksköterska på sjukhuset nära stora " +
      "torget. Varje morgon tar hon tåget till stadens centrum och köper en " +
      "kaffe på det lilla bageriet bredvid stationen. Läkaren sade åt honom " +
      "att vila en vecka och dricka mycket vatten. På lördagar säljer " +
      "marknaden färskt bröd, ost och grönsaker från gårdarna i närheten. " +
      "Stadsbiblioteket lånar ut böcker, filmer och musik till alla som bor " +
      "i området."),
    "pl" -> ("Moja siostra pracuje jako pielęgniarka w szpitalu niedaleko " +
      "głównego placu. Każdego ranka jedzie pociągiem do centrum miasta i " +
      "kupuje kawę w małej piekarni obok dworca. Lekarz powiedział mu, żeby " +
      "odpoczywał przez tydzień i pił dużo wody. W soboty na targu sprzedają " +
      "świeży chleb, ser i warzywa z okolicznych gospodarstw. Miejska " +
      "biblioteka wypożycza książki, filmy i muzykę wszystkim, którzy " +
      "mieszkają w dzielnicy."),
    "tr" -> ("Kız kardeşim ana meydanın yakınındaki hastanede hemşire olarak " +
      "çalışıyor. Her sabah şehir merkezine giden trene biniyor ve " +
      "istasyonun yanındaki küçük fırından kahve alıyor. Doktor ona bir " +
      "hafta dinlenmesini ve bol su içmesini söyledi. Cumartesi günleri " +
      "pazarda yakın çiftliklerden taze ekmek, peynir ve sebze satılıyor. " +
      "Şehir kütüphanesi mahallede oturan herkese kitap, film ve müzik " +
      "ödünç veriyor."))

  /** Full training text per language: the original three paragraphs plus
    * the round-14 extra block. */
  def trainingText(lang: String): String =
    seedCorpora(lang) + " " + seedCorporaExtra.getOrElse(lang, "")

  /** Out-of-set NEGATIVES for the `und` confidence floor: original
    * sentences in Latin-script languages with NO trained profile
    * (fi/hu/cs), plus non-language text (code, letter soup). A langid
    * filter's one forbidden failure mode is a confident wrong label on
    * out-of-set text — every entry here must classify `und`, never a
    * profiled language (LangIdSpec + the q186 invariant). */
  val negativeExamples: Map[String, Seq[String]] = Map(
    "fi" -> Seq(
      "Sää maan pohjoisosassa muuttuu nopeasti syksyn kuukausina.",
      "Lapset kävelevät aamulla kouluun ja juttelevat matkalla näkemistään asioista.",
      "Kirjasto sulkeutuu sunnuntaisin aikaisemmin kuin muina viikonpäivinä.",
      "Hänen veljensä työskentelee sairaalassa kaupungin keskustassa."),
    "hu" -> Seq(
      "Az ország északi részén az időjárás ősszel nagyon gyorsan változik.",
      "A gyerekek reggel az iskolába sétálnak és beszélgetnek az úton látottakról.",
      "A könyvtár vasárnaponként korábban zár, mint a többi napon.",
      "A bátyja a város központjában lévő kórházban dolgozik."),
    "cs" -> Seq(
      "Počasí na severu země se na podzim mění velmi rychle.",
      "Děti chodí ráno do školy a povídají si o tom, co cestou viděly.",
      "Knihovna zavírá v neděli dříve než v ostatní dny v týdnu.",
      "Jeho bratr pracuje v nemocnici v centru města."),
    "code" -> Seq(
      "x = np.zeros((batch_sz, hidden_dim)); y = torch.cat([x, x], dim=-1)",
      "SELECT t1.col_a, SUM(t2.col_b) FROM tbl_x t1 JOIN tbl_y t2 ON t1.pk = t2.fk GROUP BY 1;",
      "fn mk_vec<T: Clone>(v: &[T], n: usize) -> Vec<T> { v.iter().cycle().take(n).cloned().collect() }"),
    "soup" -> Seq(
      "qzxv wkjq pxzt bvmn hjkl qwrt zxcv plmnw krtz vbnm xswq",
      "aGVsbG8gd29ybGQgYmFzZTY0IHBheWxvYWQgbm90IGxhbmd1YWdl"))

  /** Held-out examples for the SCRIPT-gated languages (decided by Unicode
    * script, not profiles — see [[graft.functions.LangIdScorer.classify]]):
    * one sentence per language, original compositions. */
  val scriptExamples: Map[String, String] = Map(
    "zh" -> "今天天气很好我们去公园散步吧",
    "ja" -> "今日はいい天気ですね公園に行きましょう",
    "ko" -> "오늘 날씨가 좋아서 공원에 갑니다",
    "ru" -> "Сегодня хорошая погода и мы идём гулять в парк",
    "el" -> "Σήμερα ο καιρός είναι καλός και πάμε στο πάρκο",
    "ar" -> "الطقس جميل اليوم وسنذهب إلى الحديقة",
    "he" -> "מזג האוויר יפה היום ואנחנו הולכים לפארק",
    "hi" -> "आज मौसम अच्छा है और हम पार्क जा रहे हैं",
    "th" -> "วันนี้อากาศดีเราไปสวนสาธารณะกัน")

  /** Profile size (grams kept per language / per document) — the paper's
    * 300-400 range; 400 helps the close-language pairs. */
  val profileSize = 400

  /** The shared trained scorer: profiles built once at class load from
    * [[seedCorpora]], deterministic (count desc, gram) ranks. */
  lazy val scorer: graft.functions.LangIdScorer = {
    val untrained = new graft.functions.LangIdScorer(Nil, profileSize)
    new graft.functions.LangIdScorer(
      seedCorpora.keys.toSeq.sorted.map { lang =>
        (lang, untrained.profile(trainingText(lang)).toSeq)
      },
      profileSize)
  }

  /** Predicted language code of `text` (`und` when no letters), as a
    * narrow codegen'd expression. */
  def languageIdNgram(text: Column): Column =
    graft.functions.LangIdNgramExpr.langid_ngram(text, scorer)

  /** The `und` confidence floor (see [[graft.functions.LangIdScorer
    * .classifyWithScore]]): out-of-set iff normalized best distance >
    * `undAbsCutoff` AND best/mean ratio > `undRatioCutoff`. Calibrated
    * with `tools/LangIdCalib`'s automatic search on the held-out
    * fixtures: positives max (abs 0.774, ratio 0.931), negatives
    * (fi/hu/cs, code, letter soup) min (abs 0.775, ratio 0.932) — the
    * AND pair below maximizes the worst fixture margin. Natural prose in
    * a profiled language clears the floor with wide margin (abs ≈
    * 0.63–0.75); what trips it besides out-of-set languages is text that
    * is not natural prose at all (word salad, code) — the conservative
    * behavior a training-data filter wants.
    *
    * MAINTENANCE: these constants are only valid for the CURRENT
    * profiles. Any edit to [[seedCorpora]], [[seedCorporaExtra]] or
    * [[profileSize]] invalidates them — re-run
    * `runMain graft.tools.LangIdCalib` and update the pair. Drift fails
    * loudly: LlmSpec re-derives every fixture's (abs, ratio) from the
    * live profiles and checks the AND-rule against these values. */
  val undAbsCutoff = 0.768
  val undRatioCutoff = 0.918

  /** The floored scorer: same profiles as [[scorer]], `und` for
    * out-of-set text instead of the nearest profile's confident wrong
    * label. */
  lazy val scorerWithFloor: graft.functions.LangIdScorer = {
    val untrained = new graft.functions.LangIdScorer(Nil, profileSize)
    new graft.functions.LangIdScorer(
      seedCorpora.keys.toSeq.sorted.map { lang =>
        (lang, untrained.profile(trainingText(lang)).toSeq)
      },
      profileSize, undAbsCutoff = undAbsCutoff, undRatioCutoff = undRatioCutoff)
  }

  /** [[languageIdNgram]] with the calibrated `und` confidence floor —
    * unprofiled languages and non-language text return `und` instead of
    * a confident wrong label. */
  def languageIdNgramFloored(text: Column): Column =
    graft.functions.LangIdNgramExpr.langid_ngram(text, scorerWithFloor)
}
